package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextNorm

/** Block A — ingestion & validation (SURVEY.md §2.A).
  *
  * Re-expresses the reference's input pipeline
  * (scraper_v2.py:458-577): entity filtering, id validation, and
  * dedup-with-preference (keep the record carrying the strongest
  * evidence — there, a reg number; here, the latest timestamp) as
  * single-shuffle groupBy/max_by aggregations.
  */
object Ingest {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scraper_v2.py:507-520 — `if company_name not in companies or
    // reg_number:` → one record per key, preferring the most recent
    // evidence. max_by is a single map-side-combinable aggregate: one
    // shuffle keyed on user_id, no window, no self-join.
    "ingest_dedup_pref" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max_by(col("event_id"), col("ts")).as("last_event_id"),
          max_by(col("event_type"), col("ts")).as("last_event_type"),
          count(lit(1)).as("n_records"))
        .orderBy(col("user_id"))
    },

    // scraper_v2.py:513 — reg-number format gate `^0\d{12}$`,
    // generalized to the test entities' name format.
    "ingest_validate" -> { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"),
          TextNorm.isValidId(col("c_name"), "^Customer#[0-9]{9}$").as("valid"))
        .orderBy(col("c_custkey"))
    },

    // scraper_v2.py:517 — substring entity filter (the Thai-entity
    // predicate analog). Predicate is pushed into the parquet scan.
    "ingest_filter_entity" -> { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("FURNITURE", "BUILDING") &&
          col("c_name").contains("Customer"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    })

  def oracle: Map[String, String] = Map(
    "ingest_dedup_pref" ->
      """SELECT user_id,
        |  max_by(event_id, ts) AS last_event_id,
        |  max_by(event_type, ts) AS last_event_type,
        |  count(*) AS n_records
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ingest_validate" ->
      """SELECT c_custkey, c_name,
        |  regexp_matches(c_name, '^Customer#[0-9]{9}$') AS valid
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "ingest_filter_entity" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_mktsegment IN ('FURNITURE', 'BUILDING')
        |  AND c_name LIKE '%Customer%'
        |ORDER BY c_custkey""".stripMargin)
}
