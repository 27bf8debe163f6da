package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The stdout line a components-consuming query leaves behind, if
    * its run recorded a connected-components fixpoint. Factored out so
    * the format (and the None-when-no-fixpoint contract) is
    * spec-testable without running Verify.main. */
  private[graft] def fixpointLine(name: String): Option[String] =
    graft.operators.Components.lastFixpointStats.map { st =>
      s"[verify] $name fixpoint: iterations=${st.iterations} " +
        s"converged=${st.converged} last_changed=${st.lastChanged}"
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // extension-active verification: the SQL functions, the TopK
      // planner strategy, and the row_number→TopKPerKey rewrite all
      // run under the DuckDB oracle gate
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only: SPARK_GRAFT_ONLY="a,b" restricts the dump to named
    // queries for fast iteration; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    selected.foreach { case (name, fn) =>
      // per-query fixpoint attribution: Verify runs queries
      // sequentially, so reset-before / read-after pins any recorded
      // stats to THIS query (the diagnostic is JVM-global
      // last-writer-wins — see Components.lastFixpointStats)
      graft.operators.Components.resetFixpointStats()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // a components-consuming query leaves its fixpoint trace in
        // the verification artifact too, not just ScaleSmoke runs
        // (VERDICT r10 #7): a production diameter blow-up shows up as
        // converged=false / iterations at the cap right here
        fixpointLine(name).foreach(println)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries may cache small frames (quantizer anchors, component
      // labels, pipeline dims); drop them so a 70+-query session
      // doesn't accumulate stranded storage
      spark.catalog.clearCache()
      // registries a query declared (dims, MVs) must not rewrite the
      // NEXT query's plan — each query runs against clean state
      graft.plans.DimRegistry.clear(); graft.plans.MvRegistry.clear()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
