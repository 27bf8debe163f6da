package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import org.apache.spark.sql.GraftBridge.{column, expression}

object Scratch3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    d.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $label secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val canon = d.select(col("id"), TextAnalysis.canonicalize(col("text")).as("c"))
    time("canonicalize")(canon.select(sum(length(col("c")))).head())
    val toks = d.select(col("id"), TextAnalysis.wsTokens(TextAnalysis.canonicalize(col("text"))).as("toks"))
    time("tokens")(toks.select(sum(size(col("toks")))).head())
    val sig = toks.select(col("id"), column(graft.functions.expr.SimHash48(expression(col("toks")))).as("sh"))
    time("simhash48")(sig.select(sum(col("sh"))).head())
    time("simhash48-again")(sig.select(sum(col("sh"))).head())
    spark.stop()
  }
}
