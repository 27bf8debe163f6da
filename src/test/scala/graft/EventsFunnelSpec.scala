package graft

import org.apache.spark.sql.functions._

/** Pins for the event-analytics pair (funnel_steps, events_retention)
  * and the winnowing fingerprint guarantee. */
class EventsFunnelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("funnel steps are monotone and ordering-strict") {
    val r = run("funnel_steps").collect().head
    val (v, vc, full) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= vc && vc >= full, s"$v >= $vc >= $full violated")
    assert(v > 0)
    // unordered pairs over-count: users with view AND click events
    // regardless of order must be >= the ordered count
    val ev = Tables.events(spark, dir)
    val unordered = ev.filter(col("event_type").isin("view", "click"))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("k"))
      .filter(col("k") === 2).count()
    assert(unordered >= vc)
  }

  test("retention conserves mass: offset-0 is every user; cells sum to user-weeks") {
    val rows = run("events_retention").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val users = ev.select(col("user_id")).distinct().count()
    assert(rows.filter(_._2 == 0L).map(_._3).sum == users)
    val userWeeks = ev.distinct().count()
    assert(rows.map(_._3).sum == userWeeks)
    assert(rows.forall(_._2 >= 0))
  }

  test("events_markov rows are probabilities: each cur row-sums to 1") {
    val rows = run("events_markov").collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (cur, ps) =>
      val s = ps.map(_._2).sum
      assert(math.abs(s - 1.0) < 0.01, s"$cur sums to $s")
    }
  }

  test("anomaly_mad flags a strict minority; seasonality covers every weekday") {
    run("anomaly_mad").collect().foreach { r =>
      assert(r.getLong(4) < r.getLong(1) / 2,
        s"${r.getString(0)}: ${r.getLong(4)} of ${r.getLong(1)} flagged")
    }
    val dows = run("seasonality").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    dows.groupBy(_._1).foreach { case (t, ds) =>
      assert(ds.map(_._2).sorted.sameElements(1 to 7), s"$t missing weekdays")
    }
  }

  test("basket_pairs: ordered pairs, support floor, and a naive recount") {
    val rows = run("basket_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (p1, p2, s) => p1 < p2 && s >= 2 })
    // recount one pair naively
    val (p1, p2, s) = rows.head
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val naive = li.filter(col("l_partkey") === p1)
      .select(col("l_orderkey"))
      .intersect(li.filter(col("l_partkey") === p2).select(col("l_orderkey")))
      .count()
    assert(s == naive)
  }

  test("orders_rfm: 8 median-split segments partition the customer base") {
    val rows = run("orders_rfm").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet.forall(_.matches("r[01]f[01]m[01]")))
    val customers = Tables.orders(spark, dir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.values.sum == customers)
    // the best segment (recent, frequent, high-spend) must exist
    assert(rows.contains("r1f1m1"))
  }

  test("winnowing: docs sharing a substring of length w+k-1 share a fingerprint") {
    // k=5, w=4 → any shared run of >= 8 canonical chars guarantees a
    // shared fingerprint (the MOSS winnowing theorem); disjoint-
    // alphabet docs share nothing
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij"),            // shares "abcdefgh" with doc 2
      (2L, "zz abcdefgh qq"),
      (3L, "uvwxyuvwxyuvwxy")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("winnow_probe")
    val fps = docs
      .select(col("doc_id"), graft.functions.TextAnalysis.canonicalize(col("text")).as("c"))
      .select(col("doc_id"), expr(
        """CASE WHEN length(c) >= 5 THEN
          |  transform(sequence(1, length(c) - 4), i ->
          |    cast(conv(substring(md5(substring(c, i, 5)), 1, 8), 16, 10)
          |      as bigint))
          |ELSE array() END""".stripMargin).as("hs"))
      .select(col("doc_id"), expr(
        """CASE WHEN size(hs) >= 4 THEN
          |  transform(sequence(1, size(hs) - 3), i ->
          |    array_min(slice(hs, i, 4)))
          |ELSE array() END""".stripMargin).as("wins"))
      .select(col("doc_id"), array_distinct(col("wins")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared 8-char run must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "disjoint alphabets share nothing")
  }
}
