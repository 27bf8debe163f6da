import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.{NaiveBayes, Sampling}

object ProfNb {
  def time(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[prof] $label%-32s ${(System.nanoTime()-t0)/1e9}%.3f s")
  }
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  val langidLangs = Seq("de", "en", "es", "fr", "zh")
  val langidAlpha: Seq[(String, String)] = Seq(
    "de" -> "äöüßwzkg", "en" -> "theryngs", "es" -> "ñáéílors",
    "fr" -> "àèêçuvmp", "zh" -> "的一是了我不人在")
  def langidFeatDocs(s: SparkSession, dir: String): DataFrame = {
    val alpha = langidAlpha.tail.foldLeft(
      when(col("lang") === langidAlpha.head._1, lit(langidAlpha.head._2))) {
      case (acc, (l, a)) => acc.when(col("lang") === l, lit(a))
    }.otherwise(lit("________"))
    val lh = md5(concat(col("doc_id").cast("string"), lit("-lt")))
    val tail = element_at(transform(array(lh), hb =>
      concat_ws("", transform(sequence(lit(1), lit(32)), k =>
        alpha.substr(
          (conv(hb.substr(k, lit(1)), 16, 10).cast("int") % 8) + 1,
          lit(1))))), 1)
    val t = concat(
      substring(regexp_replace(lower(col("text")), "\\s+", " "), 1, 96),
      tail)
    val feats = element_at(transform(array(t), tb =>
      when(length(tb) >= 3,
        transform(sequence(lit(1), length(tb) - 2),
          i => conv(substring(md5(tb.substr(i, lit(3))), 31, 2), 16, 10)
            .cast("long").cast("string")))
        .otherwise(array().cast("array<string>"))), 1)
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextAnalysis.langId(col("text")).as("pred_marker"),
      feats.as("feats"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Tables.documents(spark, dir).count() // warm
    val fd = langidFeatDocs(spark, dir)
    time("featdocs noop")(noop(fd))
    time("featdocs no marker")(noop(fd.select("doc_id", "lang", "feats")))
    time("featdocs marker only")(noop(Tables.documents(spark, dir)
      .select(TextAnalysis.langId(col("text")).as("pm"))))
    val train = Sampling.splitLabel(langidFeatDocs(spark, dir), "doc_id", 2000)
      .filter(col("split") === "train")
    time("train (census+params)")(noop(NaiveBayes.train(train, "lang", "feats")))
    val params = NaiveBayes.broadcastParams(
      NaiveBayes.train(train, "lang", "feats"), langidLangs)
    time("score all")(noop(NaiveBayes.score(
      langidFeatDocs(spark, dir).select(col("doc_id"), col("lang"), col("feats")),
      params, langidLangs, tokensCol = "feats")))
    val held = Sampling.splitLabel(langidFeatDocs(spark, dir), "doc_id", 2000)
      .filter(col("split") === "test")
    time("score held + census")(noop(NaiveBayes.score(
      held.select(col("doc_id"), col("lang"), col("pred_marker"), col("feats")),
      params, langidLangs, tokensCol = "feats")
      .groupBy(col("lang"), col("pred"), col("pred_marker"))
      .agg(count(lit(1)).as("n"))))
    spark.stop()
  }
}
