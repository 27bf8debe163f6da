package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PRound
import graft.operators.Salted

/** Block J — scale-discipline operators: skew-safe aggregation,
  * approximate sketches, and incremental resume (the reference's
  * progress-marker pattern, scraper_v2.py:1423-1435, as an
  * anti-join/watermark filter instead of a mutable file).
  */
object Scale {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Salted two-phase aggregation — oracle is the PLAIN group-by,
    // proving the salting is semantics-preserving.
    "agg_salted" -> { (s, dir) =>
      Salted.aggSkewed(
          Tables.orders(s, dir).select(col("o_orderpriority"), col("o_totalprice")),
          Seq("o_orderpriority"), "o_totalprice")
        .select(col("o_orderpriority"),
          PRound.pround(col("sum_o_totalprice"), 2).as("revenue"), col("n_rows"))
        .orderBy(col("o_orderpriority"))
    },

    // Approximate sketches (HLL distinct, quantile sketch). Not
    // SQL-oracle-able (different sketch implementations) → rows-only.
    "agg_approx" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"))
        .orderBy(col("l_returnflag"))
    },

    // Incremental resume: already-processed set = events with
    // event_id < 500; the new batch is everything past its max
    // timestamp (watermark filter — pushed into the scan at scale).
    "resume_incremental" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val marker = ev.filter(col("event_id") < 500).agg(max(col("ts")).as("done_ts"))
      ev.crossJoin(broadcast(marker))
        .filter(col("ts") > col("done_ts"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), PRound.pround(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type"))
    })

  def oracle: Map[String, String] = Map(
    "agg_salted" ->
      """SELECT o_orderpriority, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "resume_incremental" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events
        |WHERE ts > (SELECT max(ts) FROM events WHERE event_id < 500)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
