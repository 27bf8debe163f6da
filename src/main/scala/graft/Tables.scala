package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables.
  *
  * Each loader is a plain parquet scan — Catalyst prunes columns and
  * pushes filters into the scan, so callers should select/filter
  * directly on the returned frame rather than pre-materializing.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` has shipped as two physical parquet flavors across
    * driver testdata generations: TIMESTAMP(NANOS), which Spark 4 only
    * reads as a long (`spark.sql.legacy.parquet.nanosAsLong=true`, set
    * in Verify/Bench/test sessions), and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark reads as TIMESTAMP_NTZ.
    * Normalize BOTH to the session-UTC microsecond TIMESTAMP the whole
    * engine (and its DuckDB oracles, which see a naive TIMESTAMP
    * either way) is verified against: nanos via exact integer division
    * — never double, ns-since-epoch exceeds 2^53 — matching DuckDB's
    * ns→µs truncation; NTZ via a wall-clock-preserving cast (sessions
    * pin spark.sql.session.timeZone=UTC, so the instant is the same).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _        => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
