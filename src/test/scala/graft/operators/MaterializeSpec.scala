package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Materialize: the durability knob for lineage-cut points. The
  * contract is bit-identical output under every strategy — `local`
  * (executor blocks), `reliable` (checkpoint dir), `parquet:<scratch>`
  * (write-and-rescan) — both for a bare cut and threaded through the
  * real consumers (incrementalNear's survivor cut, the PCA power
  * iteration). A cluster run flips ONE conf; nothing else may change.
  */
class MaterializeSpec extends SparkSpec {

  private def strategies: Seq[String] = {
    val scratch = Files.createTempDirectory("graft-mat").toString
    Seq("local", "reliable", s"parquet:$scratch")
  }

  private def withStrategy[A](s: String)(f: => A): A = {
    val prev = spark.conf.get(Materialize.ConfKey, "local")
    spark.conf.set(Materialize.ConfKey, s)
    try f finally spark.conf.set(Materialize.ConfKey, prev)
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("cut yields the same rows under all three strategies") {
    import spark.implicits._
    spark.sparkContext.setCheckpointDir(
      Files.createTempDirectory("graft-ckpt").toString)
    val src = (1 to 100).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "g")
    val expected = collectSorted(src.groupBy(col("g")).agg(count(lit(1)).as("n")))
    strategies.foreach { s =>
      withStrategy(s) {
        val cut = Materialize.cut(src.groupBy(col("g")).agg(count(lit(1)).as("n")))
        assert(collectSorted(cut) === expected, s"strategy $s")
        // the cut frame must be lineage-free of the source: a second
        // evaluation returns the same rows without re-deriving
        assert(collectSorted(cut) === expected, s"strategy $s re-read")
        Materialize.release(cut)
      }
    }
  }

  test("incrementalNear is strategy-invariant") {
    import spark.implicits._
    spark.sparkContext.setCheckpointDir(
      Files.createTempDirectory("graft-ckpt").toString)
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact twin
      (3L, "the quick brown fox jumped over the lazy dog"), // near twin
      (4L, "an entirely different document about spark"),
      (5L, "stored already known document text here")
    ).toDF("id", "text")
    val store = Dedup.minhashBanded(
      Seq((100L, "stored already known document text here")).toDF("id", "text"),
      "id", "text").select(col("band"), col("bh"))
    val runs = strategies.map { s =>
      withStrategy(s)(collectSorted(
        Dedup.incrementalNear(batch, store, "id", "text")))
    }
    assert(runs.distinct.size === 1,
      s"strategies disagree: ${runs.map(_.mkString(";")).mkString(" | ")}")
    // sanity: the stored doc was dropped as known, the twins collapsed
    assert(runs.head.size < 5)
  }

  test("PCA power iteration is strategy-invariant") {
    import spark.implicits._
    spark.sparkContext.setCheckpointDir(
      Files.createTempDirectory("graft-ckpt").toString)
    val vecs = (1 to 40).map { i =>
      (i.toLong, Array(i.toFloat, (i % 5).toFloat, (41 - i).toFloat))
    }.toDF("vec_id", "embedding")
    val runs = strategies.map { s =>
      withStrategy(s)(collectSorted(
        Pca.powerIteration(vecs, "embedding", dims = 3, iters = 3)))
    }
    assert(runs.distinct.size === 1)
  }

  test("reliable without a checkpoint dir fails with a clear message") {
    // a fresh context attribute we cannot unset — simulate by asserting
    // the require path only when no dir is configured
    import spark.implicits._
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      withStrategy("reliable") {
        val e = intercept[IllegalArgumentException](
          Materialize.cut(Seq((1, "a")).toDF("a", "b")))
        assert(e.getMessage.contains("setCheckpointDir"))
      }
    }
  }

  test("unknown strategy is rejected") {
    import spark.implicits._
    withStrategy("s3magic") {
      val e = intercept[IllegalArgumentException](
        Materialize.cut(Seq((1, "a")).toDF("a", "b")))
      assert(e.getMessage.contains("unknown strategy"))
    }
  }
}
