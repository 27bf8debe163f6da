package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FileIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv reads header'd files; resolveColumn picks requested > fallback > first") {
    val dir = tmp("graft-csv")
    Files.writeString(java.nio.file.Paths.get(dir, "in.csv"),
      "company_name,registration_number\nAcme Co,0123456789012\nBeta Ltd,\n")
    val df = FileIngest.csv(spark, s"$dir/in.csv")
    assert(df.count() == 2)
    assert(FileIngest.resolveColumn(df, Some("registration_number")) == "registration_number")
    assert(FileIngest.resolveColumn(df, Some("missing")) == "company_name")
    assert(FileIngest.resolveColumn(df.drop("company_name"), None) == "registration_number")
  }

  test("textLines drops blank lines and trims (reference txt input)") {
    val dir = tmp("graft-txt")
    Files.writeString(java.nio.file.Paths.get(dir, "in.txt"),
      "  Acme Co  \n\n Beta Ltd\n   \n")
    val r = FileIngest.textLines(spark, s"$dir/in.txt").as[String].collect().toSeq
    assert(r.sorted == Seq("Acme Co", "Beta Ltd"))
  }

  test("entities filters by marker, validates ids, dedups preferring valid id") {
    val df = Seq(
      ("Acme จำกัด", "0123456789012"),   // valid id
      ("Acme จำกัด", null),               // dup without id → merged
      ("Beta จำกัด", "bad-id"),           // invalid id → null
      ("NoMarker Inc", "0123456789012")   // filtered out
    ).toDF("company_name", "reg")
    val r = FileIngest.entities(df, "company_name", Some("reg"),
        Seq("จำกัด"), "^0\\d{12}$")
      .orderBy("name").as[(String, Option[String])].collect().toSeq
    assert(r == Seq(
      ("Acme จำกัด", Some("0123456789012")),
      ("Beta จำกัด", None)))
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitionedParquet writes hive partitions; reads back pruned") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/out"
    val df = Seq((1L, 1995, "a"), (2L, 1996, "b")).toDF("id", "year", "v")
    Sinks.partitionedParquet(df, dir, Seq("year"))
    assert(new java.io.File(s"$dir/year=1995").exists())
    val back = spark.read.parquet(dir).filter(col("year") === 1995)
    assert(back.select("v").as[String].collect().toSeq == Seq("a"))
  }

  test("csv sink writes header'd shards; appendParquet accumulates batches") {
    val dir = Files.createTempDirectory("graft-sink2").toString
    val df = Seq((1L, "x")).toDF("id", "v")
    Sinks.csv(df, s"$dir/csv", shards = 1)
    val back = FileIngest.csv(spark, s"$dir/csv")
    assert(back.columns.toSeq == Seq("id", "v") && back.count() == 1)
    Sinks.appendParquet(df, s"$dir/pq")
    Sinks.appendParquet(df.withColumn("id", lit(2L)), s"$dir/pq")
    assert(spark.read.parquet(s"$dir/pq").count() == 2)
  }

  test("splitFound separates matched and not-found side outputs") {
    val df = Seq((1L, true), (2L, false)).toDF("id", "found")
    val (ok, missing) = Sinks.splitFound(df, "found")
    assert(ok.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(missing.select("id").as[Long].collect().toSeq == Seq(2L))
  }
}
