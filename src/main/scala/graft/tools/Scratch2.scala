package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Dev scratch: isolate minhash stage costs. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    d.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $label rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val sh = d.select(col("id"), TextAnalysis.wordShingles(col("text"), 3).as("sh"))
    time("shingle-only") { sh.select(sum(size(col("sh")))).head(); d.count() }
    val hashed = sh.select(col("id"), transform(col("sh"), s => md5(s)).as("hs"))
    time("hashed") { hashed.select(sum(size(col("hs")))).head(); d.count() }
    val sig = hashed.select(col("id"),
      array((0 until 6).map(i =>
        array_min(transform(col("hs"), h => substring(h, i * 5 + 1, 5)))): _*).as("sig"))
    time("sig-collapsed") { sig.select(count(col("sig"))).head(); d.count() }
    // barrier: materialize hs through an exchange before the 6 mins
    val hashedBar = hashed.repartition(col("id"))
    val sigBar = hashedBar.select(col("id"),
      array((0 until 6).map(i =>
        array_min(transform(col("hs"), h => substring(h, i * 5 + 1, 5)))): _*).as("sig"))
    time("sig-after-exchange") { sigBar.select(count(col("sig"))).head(); d.count() }
    spark.stop()
  }
}
