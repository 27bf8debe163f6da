package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Solo A/B for mm_mp3_duration's cost split (VERDICT r14 #8): the
  * query synthesizes its ID3v2/MPEG fixture in-engine AND probes it,
  * so its bench growth is ambiguous between "VBR probe work" and
  * "fatter fixture". This main times, at SPARK_GRAFT_SF_DIR with the
  * Bench session shape (reps = SPARK_GRAFT_BENCH_REPS | 5, min-of-reps,
  * caches cleared between runs):
  *   fixture_only — synthesize the blob, aggregate sum(length) (the
  *                  cheapest full-materialization sink);
  *   full_query   — the real mm_mp3_duration;
  * and prints one JSON line with both plus the implied probe cost
  * (full − fixture). Recorded in BASELINE.md's adjudication notes.
  */
object Mp3Split {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def minOf(f: () => Unit): Double =
      (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }.min

    // warmup (JIT + file listing), untimed
    Tables.documents(spark, sfDir).count()
    SparkEntry.queries("mm_mp3_duration")(spark, sfDir).count()

    val fixtureOnly = minOf { () =>
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), graft.queries.Curation.mp3FixtureBlob.as("mp3"))
        .agg(sum(length(col("mp3")))).collect()
    }
    // Bench's sink is .count() (column-pruning applies); collect()
    // forces every meta field — report both so the split is readable
    // against the committed bench AND against true materialization
    val fullCount = minOf { () =>
      SparkEntry.queries("mm_mp3_duration")(spark, sfDir).count()
    }
    val fullCollect = minOf { () =>
      SparkEntry.queries("mm_mp3_duration")(spark, sfDir).collect()
    }
    println(f"""{"metric":"mp3_split","sf_dir":"$sfDir","reps":$reps,""" +
      f""""fixture_only_s":$fixtureOnly%.3f,"full_count_s":$fullCount%.3f,""" +
      f""""full_collect_s":$fullCollect%.3f,""" +
      f""""probe_implied_s":${fullCollect - fixtureOnly}%.3f}""")
    spark.stop()
  }
}
