package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Corpus, Curation, EventsQ, Ingest, Layout, Match, Norm, PipelineQ, ReshapeQ, Scale}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each SURVEY.md §2 operator has a `queries` entry; every
  * SQL-expressible one has a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  private val blocks: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Ingest.queries, Ingest.oracle),
      (Norm.queries, Norm.oracle),
      (Match.queries, Match.oracle),
      (ReshapeQ.queries, ReshapeQ.oracle),
      (EventsQ.queries, EventsQ.oracle),
      (Corpus.queries, Corpus.oracle),
      (Scale.queries, Scale.oracle),
      (Layout.queries, Layout.oracle),
      (Curation.queries, Curation.oracle),
      (Analytics.queries, Analytics.oracle),
      (PipelineQ.queries, PipelineQ.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.queries("join_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    blocks.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    blocks.iterator.flatMap(_._2).toMap
}
