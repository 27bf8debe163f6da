package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Corpus

/** Dev scratch main for plan iteration (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val name = args.headOption.getOrElse("dedup_minhash_lsh")
    // warmup
    spark.read.parquet(s"$dir/documents.parquet").count()
    val t0 = System.nanoTime()
    val n = Corpus.queries(name)(spark, dir).count()
    println(s"RESULT $name rows=$n secs=${(System.nanoTime() - t0) / 1e9}")
    if (args.length > 1) Corpus.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
