package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.PRound
import graft.operators.Salted

/** Block J — scale-discipline operators: skew-safe aggregation,
  * approximate sketches, and incremental resume (the reference's
  * progress-marker pattern, scraper_v2.py:1423-1435, as an
  * anti-join/watermark filter instead of a mutable file).
  */
object Scale {

  /** (rid, x) rows for the KLL family: row-unique key, price in exact
    * cents; `pred` optionally restricts the slice (the merge split).
    * Cents use the repo's exact-cents idiom — round THEN cast — because
    * a bare double→long cast truncates toward zero in Spark while
    * DuckDB's CAST rounds to nearest; both engines now round
    * explicitly, so the bit-exactness contract survives data regen. */
  private def kllRows(s: SparkSession, dir: String,
                      pred: Column = lit(true)): DataFrame =
    Tables.lineitem(s, dir).filter(pred).select(
      concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("rid"),
      round(col("l_extendedprice") * 100).cast("long").as("x"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Join-key skew diagnostics — the report that decides whether a
    // join needs salting/AQE before it runs: per-key cardinality
    // stats (max, exact p99, skew ratio vs uniform) plus the top-5
    // heavy keys inline. One key-count agg (map-side combined) and
    // tiny follow-ups; the heavy-key list is TakeOrderedAndProject
    // folded to a single string so the report is one row.
    "skew_report" -> { (s, dir) =>
      val counts = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        PRound.pround(expr("percentile(cnt, 0.99)"), 4).as("p99_cnt"),
        PRound.pround(sum(col("cnt")).cast("double") / count(lit(1)), 4)
          .as("avg_cnt"))
      val heavy = counts.orderBy(col("cnt").desc, col("l_orderkey")).limit(5)
        .select(struct((-col("cnt")).as("nc"), col("l_orderkey").as("k")).as("p"))
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .select(concat_ws(",", transform(col("ps"),
          p => concat(p.getField("k"), lit(":"), -p.getField("nc"))))
          .as("heavy_keys"))
      stats.crossJoin(broadcast(heavy))
        .select(col("n_keys"), col("max_cnt"), col("p99_cnt"), col("avg_cnt"),
          PRound.pround(col("max_cnt") / col("avg_cnt"), 4).as("skew_ratio"),
          col("heavy_keys"))
    },

    // Incremental rollup maintenance — the merge step that keeps a
    // materialized aggregate current WITHOUT rescanning history: the
    // pre-1997 base agg and the 1997+ delta agg combine by summing,
    // and the oracle computes the FULL-scan aggregate directly, so
    // equality IS the merge≡rescan proof. Monetary sums run as
    // DECIMAL(18,2) — exact integer arithmetic, so the merged total
    // is bit-identical to the full scan under any partition order.
    "agg_incremental" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderpriority"),
        year(col("o_orderdate")).as("y"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      def rollup(d: DataFrame): DataFrame =
        d.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("price")).as("total"))
      rollup(o.filter(col("y") < 1997))
        .unionByName(rollup(o.filter(col("y") >= 1997)))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).as("n_orders"),
          sum(col("total")).cast(DecimalType(28, 2)).as("total_price"))
        .orderBy(col("o_orderpriority"))
    },
    // Incremental maintenance of a JOIN view — agg_incremental's
    // two-table sibling: V = orders⋈customer grouped by segment, with
    // BOTH sides receiving a delta batch (1997+ orders; the %10==9
    // customer-key stripe plays the "customers registered since the
    // snapshot" role, so base orders referencing them match ONLY via
    // the delta term — non-vacuous by construction). The algebra is
    //   (A_b+ΔA)⋈(B_b+ΔB) = A_b⋈B_b  +  A_b⋈ΔB  +  ΔA⋈(B_b+ΔB)
    // so the refresh touches: the materialized base view (at 100 TB a
    // stored table, read not recomputed), one fact pass keyed on the
    // tiny new-customer set (broadcast ΔB — at cluster scale the
    // delta keys push a DPP/Bloom prune into the fact scan so only
    // matching partitions are read; operators.Bloom is that path),
    // and a delta-sized fact scan against the full dim. Partials
    // merge by SUMMING — counts and DECIMAL(18,2) totals, so the
    // merged view is bit-identical to the full rescan under any
    // partition order. The oracle IS the full rescan: equality is the
    // merge≡rescan proof.
    "ivm_join" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_custkey"),
        year(col("o_orderdate")).as("y"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      val oBase  = o.filter(col("y") < 1997)
      val oDelta = o.filter(col("y") >= 1997)
      val cBase  = c.filter(col("o_custkey") % 10 =!= 9)
      val cDelta = c.filter(col("o_custkey") % 10 === 9)
      def view(a: DataFrame, b: DataFrame): DataFrame =
        a.join(broadcast(b), Seq("o_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("price")).as("total"))
      view(oBase, cBase)                  // materialized base view
        .unionByName(view(oBase, cDelta)) // new-dim-key term
        .unionByName(view(oDelta, c))     // delta-fact term
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("n")).as("n_orders"),
          sum(col("total")).cast(DecimalType(28, 2)).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },

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

    // Spark's NATIVE approximate sketches (HLL++ distinct,
    // percentile_approx) under a TOLERANCE-BAND oracle. The raw
    // estimates can't be replayed in DuckDB (different sketch
    // implementations), so until round 10 this was the one rows-only
    // §2 row — no hard correctness signal. The audit shape fixes that
    // without dropping the native sketches: alongside each estimate
    // the query computes the EXACT value (oracle-replayable) and a
    // boolean asserting the estimate sits inside the sketch's
    // documented error band — HLL++ at default rsd=0.05 within 3σ
    // (15%) of the exact distinct count; percentile_approx at
    // accuracy=1000 guarantees rank error ≤ 0.001, checked against the
    // 100× wider exact [p0.45, p0.55] value band (both ends computed
    // by Spark's exact percentile, so the boolean is engine-local and
    // deterministic). The oracle replays the exact column and declares
    // the contract booleans TRUE: a sketch regression that drifts out
    // of band flips the Spark boolean and fails the hash — the same
    // audit discipline as ann_recall / sketch_countmin's est-vs-exact.
    "agg_approx" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_orderkey")).as("__ae"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("__am"),
          expr("percentile(l_extendedprice, 0.45)").as("__lo"),
          expr("percentile(l_extendedprice, 0.55)").as("__hi"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("__ae").cast("double") / col("exact_orders") - 1.0) <= 0.15)
            .as("orders_in_band"),
          (col("__am") >= col("__lo") && col("__am") <= col("__hi"))
            .as("median_in_band"))
        .orderBy(col("l_returnflag"))
    },

    // Salted skew join — oracle = the plain join, proving the
    // salt-and-replicate plan is semantics-preserving.
    "join_salted" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val c = Tables.customer(s, dir).select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Salted.joinSkewed(o, c, Seq("o_custkey"), buckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          PRound.pround(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },

    // Skew-report-DRIVEN salting: the measured max/avg key ratio
    // picks the salt factor (1-row broadcast — no collect), closing
    // the loop between skew_report's diagnosis and joinSkewed's
    // remedy. Oracle = the same plain join as join_salted: whatever
    // factor the diagnosis lands on, the join is semantics-preserving.
    "join_skew_auto" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val c = Tables.customer(s, dir).select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Salted.joinSkewedAuto(o, c, Seq("o_custkey"), maxBuckets = 64)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          PRound.pround(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },

    // The custom whole-operator top-k (plans.TopKPerKey): partial
    // bounded-heap pruning -> shuffle -> final, no window sort.
    // Oracle = the window formulation, proving plan equivalence.
    "topk_custom" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
      val rev = Tables.orders(s, dir)
        .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("rev"))
      val joined = c.join(rev, col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment"), col("c_custkey"), col("rev"))
      graft.operators.TopK.perKey(joined, Seq("c_mktsegment"), "rev", "c_custkey", 3)
        .select(col("c_mktsegment"), col("c_custkey"),
          PRound.pround(col("rev"), 2).as("revenue"))
        .orderBy(col("c_mktsegment"), col("revenue").desc, col("c_custkey"))
    },

    // GLOBAL top-k on the custom operator (empty key set → partial
    // execs prune every partition to k, the final exec merges under
    // AllTuples): the "top 10 anything corpus-wide" query without a
    // global sort.
    "topk_global" -> { (s, dir) =>
      // rank on an EXACT decimal sum (prices are 2-dp values): a float
      // sum's partial-aggregation order differs between engines, so a
      // rank-boundary tie could flip (the §4 no-float-SUM-ordering
      // rule); the decimal ranking is bit-deterministic, and the cast
      // back to double is exact
      val rev = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      graft.operators.TopK.perKey(rev, Nil, "rev", "o_custkey", 10)
        .select(col("o_custkey"), col("rev").cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_custkey"))
    },

    // Deterministic Count-Min Sketch (md5-slice hashing → the oracle
    // rebuilds the sketch table bit-for-bit): per-key frequency upper
    // bounds vs exact counts for the probed keys. est >= exact always;
    // the gap is the collision overestimate.
    "sketch_countmin" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_partkey").as("key"))
      val sk = graft.operators.Sketch.countMin(li, "key")
      val probes = li.filter(col("key") <= 20).distinct()
      val exact = li.groupBy(col("key")).agg(count(lit(1)).as("exact"))
      sk.estimate(probes, "key")
        .join(exact, Seq("key"))
        .select(col("key"), col("est"), col("exact"))
        .orderBy(col("key"))
    },

    // Pre-flight self-join blowup check: the CMS inner-product
    // estimate of |lineitem ⋈ lineitem on l_partkey| (= Σc(k)², AMS
    // F₂ — exactly the output size a dedup-style self-join would
    // produce) against the exact degree-squared sum. Two broadcast-
    // size sketch tables answer it WITHOUT running the join; est ≥
    // exact in expectation with additive error ‖·‖₁²/width. The
    // 4-dp ratio makes the overestimate auditable.
    "cms_join_card" -> { (s, dir) =>
      import graft.operators.Sketch
      val keys = Tables.lineitem(s, dir).select(col("l_partkey").as("key"))
      val sk = Sketch.countMin(keys, "key", depth = 4, width = 1024)
      val est = Sketch.joinCardinality(sk, sk)
      val exact = keys.groupBy(col("key")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("exact_rows"))
      est.crossJoin(exact)
        .select(col("est_rows"), col("exact_rows"),
          PRound.pround(col("est_rows").cast("double") / col("exact_rows"), 4)
            .as("ratio"))
    },

    // Heavy hitters on the sketch path: CMS upper-bound estimates for
    // every candidate key, global top-10 on the custom TopKPerKey
    // operator (bounded heaps, no global sort), exact counts joined
    // for the overestimate audit. The mergeable-sketch frequent-items
    // shape: at 100 TB the sketch builds in one combine-friendly pass
    // and candidates come from a sample — est >= exact always.
    "sketch_heavy_hitters" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_suppkey").as("key"))
      val sk = graft.operators.Sketch.countMin(li, "key")
      val est = sk.estimate(li.distinct(), "key")
      val exact = li.groupBy(col("key")).agg(count(lit(1)).as("exact"))
      graft.operators.TopK.perKey(est, Nil, "est", "key", 10)
        .join(exact, Seq("key"))
        .select(col("key"), col("est"), col("exact"))
        .orderBy(col("est").desc, col("key"))
    },

    // GROUPED heavy hitters on the CMS path (VERDICT r10 #8): per-
    // language top-5 terms from per-group mergeable sketches — the
    // grouped shape of sketch_heavy_hitters. The sketch builds from
    // TWO batch halves merged cell-wise (the oracle replays the
    // full-scan build, so hash equality IS the grouped merge≡full
    // proof), the estimate join is keyed on (lang, j, bucket) —
    // never broadcast; the group count is unbounded at scale — and
    // the per-group podium runs on the bounded-heap TopKPerKey
    // operator, no window sort. Exact counts joined for the
    // overestimate audit. The token explode is cut once (four
    // consumers: two sketch halves, probes, exact).
    "sketch_hh_grouped" -> { (s, dir) =>
      import graft.operators.{Materialize, Sketch, TopK}
      val toks = Materialize.cut(
        Tables.documents(s, dir)
          .select(col("lang"), col("doc_id"),
            explode(graft.functions.TextAnalysis.wsTokens(col("text")))
              .as("term")))
      val base = Sketch.countMinGrouped(
        toks.filter(col("doc_id") % 2 === 0), Seq("lang"), "term")
      val delta = Sketch.countMinGrouped(
        toks.filter(col("doc_id") % 2 =!= 0), Seq("lang"), "term")
      val merged = Sketch.mergeCmsGrouped(base, delta)
      val probes = toks.select(col("lang"), col("term")).distinct()
      val exact = toks.groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("exact"))
      TopK.perKey(merged.estimate(probes, "term"), Seq("lang"), "est", "term", 5)
        .join(exact, Seq("lang", "term"))
        .select(col("lang"), col("term"), col("est"), col("exact"))
        .orderBy(col("lang"), col("est").desc, col("term"))
    },

    // Deterministic HLL-style distinct sketch: unlike agg_approx's
    // opaque approx_count_distinct binary, the md5-register sketch is
    // reproduced by the oracle bit-for-bit — an approx estimator
    // under the exact-hash gate, alongside the exact count.
    "sketch_hll_distinct" -> { (s, dir) =>
      val keys = Tables.lineitem(s, dir).select(col("l_orderkey").as("key"))
      graft.operators.Sketch.hllDistinct(keys, "key")
        .crossJoin(keys.agg(countDistinct(col("key")).as("exact")))
        .select(col("used"), col("raw_est"), col("exact"))
    },

    // CMS is LINEAR: per-batch sketches merged cell-wise estimate
    // EXACTLY like the sketch built on the full scan — the
    // incremental-maintenance property that lets a deployment keep
    // daily sketches and fold them at query time instead of
    // rescanning history (agg_incremental for frequency sketches).
    // The oracle IS the full-scan build, so equality is the
    // merge≡full proof, exact — not within error bounds.
    "sketch_cms_merge" -> { (s, dir) =>
      import graft.operators.Sketch
      val o = Tables.orders(s, dir).select(col("o_custkey").as("key"),
        year(col("o_orderdate")).as("y"))
      val base  = Sketch.countMin(o.filter(col("y") < 1997).select("key"), "key")
      val delta = Sketch.countMin(o.filter(col("y") >= 1997).select("key"), "key")
      val merged = Sketch.mergeCms(base, delta)
      val probes = o.filter(col("key") <= 20).select("key").distinct()
      val exact = o.groupBy(col("key")).agg(count(lit(1)).as("exact"))
      merged.estimate(probes, "key")
        .join(exact, Seq("key"))
        .select(col("key"), col("est"), col("exact"))
        .orderBy(col("key"))
    },

    // HLL registers merge by MAX (associative, commutative,
    // idempotent) — merged per-batch registers equal the full-scan
    // registers exactly, so the distinct estimate is identical. Same
    // incremental story as sketch_cms_merge; same full-scan oracle.
    // Poisson-bootstrap confidence interval for the mean, per event
    // type (round 11) — the distributed-bootstrap technique: classic
    // resampling needs n draws per resample from ONE place; the
    // Poisson(1) approximation makes each row's multiplicity in each
    // of the B resamples a LOCAL deterministic decision (md5 of
    // (row, b) → uniform → inverse Poisson CDF), so the whole
    // bootstrap is one map-side-combined aggregation to |types|·B
    // partial rows — nothing data-sized ever shuffles. The resample
    // means divide exact DECIMAL sums; the CI is an exact percentile
    // over the B-row frame. Deterministic end to end, replayed
    // bit-for-bit by the oracle.
    "stats_bootstrap_ci" -> { (s, dir) =>
      val B = 100
      val v = PRound.pround(col("value"), 4).cast("decimal(12,4)")
      val rows = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), v.as("v"),
          explode(sequence(lit(1), lit(B))).as("b"))
      val u = conv(substring(md5(
          concat_ws("|", col("event_id"), col("b"))), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0)
      // inverse Poisson(1) CDF thresholds, full double precision so
      // both engines compare the same literals
      val m = when(u < 0.36787944117144233, 0L)
        .when(u < 0.7357588823428847, 1L)
        .when(u < 0.9196986029286058, 2L)
        .when(u < 0.9810118431238462, 3L)
        .when(u < 0.9963401531726563, 4L)
        .when(u < 0.9994058151824183, 5L)
        .otherwise(6L)
      val res = rows.withColumn("m", m)
        .groupBy(col("event_type"), col("b"))
        .agg(sum(col("m") * col("v")).as("sv"), sum(col("m")).as("n"))
        .select(col("event_type"),
          when(col("n") > 0,
            col("sv").cast("double") / col("n").cast("double"))
            .as("mean_b"))
      res.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_resamples"),
          PRound.pround(expr("percentile(mean_b, 0.025)"), 4).as("ci_lo"),
          PRound.pround(expr("percentile(mean_b, 0.975)"), 4).as("ci_hi"))
        .orderBy(col("event_type"))
    },

    // Rolling 28-day MAU + DAU/MAU stickiness per day — THE
    // engagement ratio, and the query that shows why mergeable
    // sketches exist: an exact 28-day rolling distinct either
    // re-scans 28 days per day or explodes every user 28× — the HLL
    // register frame instead makes it a WINDOW MAX (registers merge
    // by max, so "sketch of a 28-day union" = per-bucket max over the
    // day range). The rolling state is the calendar-bounded
    // (days × 64) densified register frame; DAU stays exact (one
    // keyed distinct). Every piece is md5-deterministic and the
    // harmonic sum is powers of two (order-free in double), so DuckDB
    // replays the estimate bit-for-bit.
    "dau_mau_stickiness" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Sketch
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("d"), col("user_id"))
      val daily = Sketch.hllRegistersGrouped(ev, Seq("d"), "user_id")
      val span = ev.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      val spine = span
        .select(explode(sequence(col("d0"), col("d1"))).as("d"))
        .crossJoin(s.range(64).select(col("id").as("b")))
      val dense = spine.join(daily, Seq("d", "b"), "left")
        .withColumn("di", datediff(col("d"), to_date(lit("1990-01-01"))))
      val w = Window.partitionBy(col("b")).orderBy(col("di"))
        .rangeBetween(-27, 0)
      val roll = dense.withColumn("reg28", max(col("reg")).over(w))
      val mau = roll.groupBy(col("d"))
        .agg(count(col("reg28")).as("used"),
          sum(pow(lit(2.0), -col("reg28"))).as("s"))
      val est = lit(0.709 * 64 * 64) /
        (col("s") + (lit(64) - col("used")))
      val dau = ev.groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("dau"))
      mau.join(dau, Seq("d"))
        .select(col("d"), col("dau"),
          PRound.pround(est, 2).as("mau_est_28d"),
          PRound.pround(col("dau").cast("double") / est, 4).as("stickiness"))
        .orderBy(col("d"))
    },

    "sketch_hll_merge" -> { (s, dir) =>
      import graft.operators.Sketch
      val o = Tables.orders(s, dir).select(col("o_custkey").as("key"),
        year(col("o_orderdate")).as("y"))
      val regs = Sketch.hllRegisters(o.filter(col("y") < 1997), "key")
        .unionByName(Sketch.hllRegisters(o.filter(col("y") >= 1997), "key"))
        .groupBy(col("b")).agg(max(col("reg")).as("reg"))
      Sketch.hllEstimate(regs)
        .crossJoin(o.agg(countDistinct(col("key")).as("exact")))
        .select(col("used"), col("raw_est"), col("exact"))
    },

    // NULL-KEY skew bypass — the other join skew (join_salted handles
    // hot VALUES): in a left outer join every null foreign key hashes
    // to ONE partition and rides the exchange for nothing (null never
    // equi-matches). The fix routes null-key rows AROUND the join —
    // they never enter the exchange — and unions them back with null
    // dim columns; with a 30% orphan rate at 100 TB that's a third of
    // the shuffle deleted, and no straggler reducer. Oracle = the
    // plain LEFT JOIN (bypass is pure plan surgery). The bypass rows
    // surface under an explicit 'UNMATCHED' label — a NULL group key
    // would sort NULLS FIRST in Spark but NULLS LAST in DuckDB, and
    // the driver's hash is row-order-sensitive (the r8 failure).
    "join_null_bypass" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        when(col("o_orderkey") % 3 === 0, lit(null)).otherwise(col("o_custkey"))
          .as("k"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("k"), col("c_mktsegment"))
      val matched = o.filter(col("k").isNotNull).join(c, Seq("k"), "left")
      val bypassed = o.filter(col("k").isNull)
        .withColumn("c_mktsegment", lit(null).cast("string"))
      matched.unionByName(bypassed)
        .groupBy(coalesce(col("c_mktsegment"), lit("UNMATCHED"))
          .as("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          PRound.pround(sum(col("price")).cast("double"), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },

    // Mergeable BLOOM: filters built per batch OR together into
    // exactly the filter a full-corpus build produces (bit_or is
    // associative/commutative/idempotent — same linearity family as
    // the CMS and HLL merges; this closes the mergeable-sketch trio).
    // The query builds era-split filters, merges by word-wise OR, and
    // PROVES bit-equality against the full build inside the result;
    // the oracle recomputes the set-bit census independently from the
    // distinct md5 positions.
    "sketch_bloom_merge" -> { (s, dir) =>
      import graft.operators.Bloom
      val o = Tables.orders(s, dir)
        .select(col("o_custkey").as("key"), year(col("o_orderdate")).as("y"))
      val bits = 4096
      val fa = Bloom.build(o.filter(col("y") < 1997), "key", bits, 4)
      val fb = Bloom.build(o.filter(col("y") >= 1997), "key", bits, 4)
      val full = Bloom.build(o, "key", bits, 4)
      def pop(c: Column): Column =
        aggregate(transform(c, w => bit_count(w).cast("long")),
          lit(0L), (a, x) => a + x)
      fa.packed.select(col("__graft_bloom_words").as("wa"))
        .crossJoin(fb.packed.select(col("__graft_bloom_words").as("wb")))
        .crossJoin(full.packed.select(col("__graft_bloom_words").as("wf")))
        .select(zip_with(col("wa"), col("wb"),
          (x, y) => x.bitwiseOR(y)).as("wm"), col("wf"))
        .select(size(col("wm")).as("n_words"),
          (col("wm") === col("wf")).as("merge_equals_full"),
          pop(col("wm")).as("n_set_merged"),
          pop(col("wf")).as("n_set_full"))
    },

    // HLL SET OPERATIONS: the union sketch is exact register-max, and
    // inclusion-exclusion (|A∩B| ≈ est(A) + est(B) − est(A∪B)) prices
    // an intersection without ever shuffling the raw keys — the
    // pre-flight a cross-era repeat-customer (or cross-source overlap)
    // question runs before paying for the exact join. Three 64-row
    // sketches + one exact audit aggregate; error grows with the
    // symmetric difference (documented HLL property), which the
    // side-by-side exact count makes visible.
    "hll_intersect" -> { (s, dir) =>
      import graft.operators.Sketch
      val o = Tables.orders(s, dir).select(col("o_custkey").as("key"),
        year(col("o_orderdate")).as("y"))
      val ra = Sketch.hllRegisters(o.filter(col("y") < 1997), "key")
      val rb = Sketch.hllRegisters(o.filter(col("y") >= 1997), "key")
      val ru = ra.unionByName(rb).groupBy(col("b")).agg(max(col("reg")).as("reg"))
      val ea = Sketch.hllEstimate(ra).select(col("raw_est").as("est_a"))
      val eb = Sketch.hllEstimate(rb).select(col("raw_est").as("est_b"))
      val eu = Sketch.hllEstimate(ru).select(col("raw_est").as("est_union"))
      val exact = o.groupBy(col("key"))
        .agg(max(when(col("y") < 1997, 1).otherwise(0)).as("ina"),
          max(when(col("y") >= 1997, 1).otherwise(0)).as("inb"))
        .agg(sum(when(col("ina") === 1 && col("inb") === 1, 1).otherwise(0))
          .cast("long").as("exact_intersect"))
      ea.crossJoin(eb).crossJoin(eu).crossJoin(exact)
        .select(col("est_a"), col("est_b"), col("est_union"),
          PRound.pround(col("est_a") + col("est_b") - col("est_union"), 2)
            .as("est_intersect"),
          col("exact_intersect"))
    },

    // Quantile estimates from a mergeable equi-width histogram — the
    // third leg of the sketch trio (distinct=HLL, frequency=CMS,
    // quantiles=histogram). Pass 1 is a scalar min/max agg; pass 2
    // bins rows with pure integer/exact-double arithmetic (map-side
    // combinable, 128 output rows); the cumulative walk + linear
    // interpolation runs on the 128-row sketch only. est is within
    // one bin width of the true quantile (err_bound column); the
    // oracle replays bins AND interpolation bit-for-bit.
    "sketch_quantile" -> { (s, dir) =>
      graft.operators.Sketch.histogramQuantiles(
          Tables.documents(s, dir).select(col("n_chars").as("x")),
          "x", bins = 128, qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .select(col("q"), PRound.pround(col("est"), 4).as("est"),
          col("err_bound"))
        .orderBy(col("q"))
    },

    // Grouped quantiles on the sketch path — the per-stratum shape of
    // sketch_quantile (as profile_grouped is to table_profile_approx):
    // per-group bin params broadcast back, per-group cum windows over
    // the groups×bins sketch. At 100 TB this is "p50/p95 doc length
    // per language" in two linear passes.
    "quantile_grouped" -> { (s, dir) =>
      graft.operators.Sketch.histogramQuantiles(
          Tables.documents(s, dir).select(col("lang"), col("n_chars").as("x")),
          "x", bins = 64, qs = Seq(0.5, 0.95), groupCols = Seq("lang"))
        .select(col("lang"), col("q"), PRound.pround(col("est"), 4).as("est"),
          col("err_bound"))
        .orderBy(col("lang"), col("q"))
    },

    // Mergeable RANK sketch with a distribution-free error guarantee
    // and NO range pre-pass (round 14, VERDICT r13 #3 — the fourth
    // sketch leg; retires the histogram's heavy-tail/unknown-range
    // weakness): operators.Kll assigns every row a geometric LEVEL
    // from md5 leading-one bits and keeps rows above a capacity-
    // driven level floor — "compaction" is the floor rising, a
    // deterministic function of the summable level counts, which is
    // what makes merge-then-query ≡ build-on-concat BIT-EXACT
    // (KllSpec) where classic KLL's promote-half compaction cannot
    // be. Quantiles over l_extendedprice in exact cents; the oracle
    // replays levels, floor, kept census and the weighted cumulative
    // walk — the compaction replay the sketch family's oracles all do.
    "sketch_kll" -> { (s, dir) =>
      val sk = graft.operators.Kll.build(kllRows(s, dir), "rid", "x",
        k = 256)
      graft.operators.Kll.quantiles(sk, Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy(col("q"))
    },

    // Merge-then-query ≡ build-on-the-concatenation, as an ORACLE row
    // (the sketch_cms_merge discipline, strengthened: CMS equality is
    // cell-wise linearity, KLL's is the floor homomorphism — floors
    // only rise under summed level counts): two half-corpus sketches
    // by linenumber parity, merged, quantiled; the oracle IS the
    // full-build SQL, so bit-equality is the incremental ≡ rebuild
    // proof for rank state.
    "sketch_kll_merge" -> { (s, dir) =>
      val a = graft.operators.Kll.build(
        kllRows(s, dir, col("l_linenumber") % 2 === 0), "rid", "x", k = 256)
      val b = graft.operators.Kll.build(
        kllRows(s, dir, col("l_linenumber") % 2 === 1), "rid", "x", k = 256)
      graft.operators.Kll.quantiles(graft.operators.Kll.merge(a, b),
          Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy(col("q"))
    },

    // The build-once/serve-many topology for rank state (the
    // ThresholdStore/bloom_stored discipline): the k=256 sketch is
    // built AT MOST ONCE per dataset generation into the content-keyed
    // DatasetCache (capacity in the artifact name) and every serve
    // quantiles the ~k-row stored frames — the serve plan never scans
    // lineitem (plan-gated). Shares sketch_kll's oracle: stored ≡
    // fresh is the determinism contract.
    "sketch_kll_stored" -> { (s, dir) =>
      val store = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("lineitem.parquet"), "kll_extprice_k256") { path =>
        val sk = graft.operators.Kll.build(
          kllRows(s, dir), "rid", "x", k = 256)
        sk.levelCounts.write.mode("overwrite").parquet(s"$path/counts")
        sk.items.write.mode("overwrite").parquet(s"$path/items")
      }
      val sk = graft.operators.Kll.KllSketch(
        s.read.parquet(s"$store/counts"),
        s.read.parquet(s"$store/items"), k = 256)
      graft.operators.Kll.quantiles(sk, Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy(col("q"))
    },

    // Per-GROUP KLL quantiles (the grouped sibling, as quantile_grouped
    // is to sketch_quantile): p50/p95 doc length per language from the
    // level-sampled sketch — per-group floors over each group's own
    // level spine, so small strata stay exact while big ones compact;
    // no range pre-pass, no per-group min/max scan.
    "sketch_kll_grouped" -> { (s, dir) =>
      graft.operators.Kll.quantilesGrouped(
          Tables.documents(s, dir)
            .select(col("lang"), col("doc_id"), col("n_chars")),
          groupCols = Seq("lang"), idCol = "doc_id", xCol = "n_chars",
          k = 64, qs = Seq(0.5, 0.95))
        .orderBy(col("lang"), col("q"))
    },

    // Written as the idiomatic row_number window ON PURPOSE: with
    // GraftExtensions active (Verify/Bench sessions), the
    // plans.TopKRewrite optimizer rule swaps in the bounded-heap
    // TopKPerKey operator — this oracle row proves the rewrite
    // semantics-preserving on real data, not just on spec fixtures.
    "topk_rewrite" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
      val rev = Tables.orders(s, dir)
        .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("rev"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("rev").desc, col("c_custkey"))
      c.join(rev, col("c_custkey") === col("o_custkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("c_custkey"),
          PRound.pround(col("rev"), 2).as("revenue"))
        .orderBy(col("c_mktsegment"), col("revenue").desc, col("c_custkey"))
    },

    // Incremental resume: already-processed set = events with
    // event_id < 500; the new batch is everything past its max
    // timestamp. The marker is a runtime scalar (broadcast crossJoin +
    // filter), NOT a static PushedFilters entry — correct plan, one
    // broadcast; a deployment wanting scan-level pruning would
    // materialize the marker to a literal in a two-step job (see
    // sources.ProgressMarker).
    "resume_incremental" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val marker = ev.filter(col("event_id") < 500).agg(max(col("ts")).as("done_ts"))
      ev.crossJoin(broadcast(marker))
        .filter(col("ts") > col("done_ts"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), PRound.pround(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type"))
    },

    // Materialized-view rewrite end-to-end: build + register the
    // (returnflag, linestatus) summary, then run the COARSER per-flag
    // aggregate against the BASE table — plans.MvRewrite reroutes it
    // to the summary scan (MvRewriteSpec gates the plan: the
    // optimized query reads the MV parquet, not lineitem). The oracle
    // computes the same aggregate from the raw table, so equality
    // proves the partial-combine algebra: COUNT ≡ SUM(cnt), AVG ≡
    // SUM(sum)/SUM(cnt) — never AVG(avg) — and sum_qty is an exact
    // integral-double sum, associativity-proof through the two-stage
    // re-aggregation. At 100 TB this rewrite IS the query: a few
    // pre-aggregated rows replace the fact-table scan, with user SQL
    // unchanged.
    // PK-FK join elimination fired for real: customer is DECLARED a
    // dimension (unique c_custkey + RELY integrity — the DimRegistry
    // contract), the query joins it but reads only orders columns, so
    // plans.JoinElimination deletes the join — the optimized plan
    // scans ORDERS ALONE (plan-gated in JoinEliminationSpec). The
    // oracle EXECUTES the join in DuckDB, so the bit-exact match is
    // the semantics-preservation proof on this data.
    "join_eliminated" -> { (s, dir) =>
      import graft.plans.DimRegistry
      DimRegistry.register("customer_dim", Tables.customer(s, dir),
        "c_custkey", factCols = Set("o_custkey"))
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          PRound.pround(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    "agg_mv_rewrite" -> { (s, dir) =>
      import graft.plans.MvRegistry
      val base = Tables.lineitem(s, dir)
      val mvDir = s"${sys.props("java.io.tmpdir")}/graft_mv/" +
        dir.replaceAll("[^a-zA-Z0-9.]", "_") + "/lineitem_rfls"
      // rebuild unregistered: a registered def from a prior run would
      // reroute the BUILD aggregate to the stale summary
      MvRegistry.deregister("lineitem_rfls")
      base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_price"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(mvDir)
      MvRegistry.register("lineitem_rfls", base,
        groupKeys = Seq("l_returnflag", "l_linestatus"),
        measures = Map(
          ("sum", "l_quantity") -> "sum_qty",
          ("sum", "l_extendedprice") -> "sum_price",
          ("min", "l_shipdate") -> "min_ship",
          ("max", "l_shipdate") -> "max_ship",
          ("count", "*") -> "cnt"),
        mv = s.read.parquet(mvDir))
      base.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"),
          PRound.pround(avg(col("l_extendedprice")), 4).as("avg_price"),
          max(col("l_shipdate")).as("last_ship"))
        .orderBy(col("l_returnflag"))
    })

  /** DuckDB nibble arithmetic: value of the `n` hex chars of `h`
    * starting at 1-based offset `off`. */
  private[queries] def hexN(h: String, off: Int, n: Int): String =
    (0 until n).map { i =>
      val mult = 1L << (4 * (n - 1 - i))
      s"(strpos('0123456789abcdef', substr($h, ${off + i}, 1)) - 1) * $mult"
    }.mkString(" + ")

  private def hex4(h: String, off: Int): String = hexN(h, off, 4)

  /** The sketch_kll full-build replay — shared verbatim by
    * sketch_kll_merge (merge ≡ full is the homomorphism proof) and
    * sketch_kll_stored (stored ≡ fresh is the determinism
    * contract). */
  private val kllFullSql: String = {
      // 20-bit md5 slice as an integer, then leading-one-bit count
      val key = "CAST(l_orderkey AS VARCHAR) || '-' || " +
        "CAST(l_linenumber AS VARCHAR)"
      val x20 = (1 to 5).map { i =>
        val mult = 1L << (4 * (5 - i))
        s"(strpos('0123456789abcdef', substr(md5($key), $i, 1)) - 1) * $mult"
      }.mkString(" + ")
      val lvlCase = (20 to 1 by -1).map { f =>
        s"WHEN x20 >= ${(1L << 20) - (1L << (20 - f))} THEN $f"
      }.mkString(" ")
      s"""WITH raw AS (
         |  SELECT $x20 AS x20,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS x
         |  FROM lineitem),
         |lv AS (
         |  SELECT CAST(CASE $lvlCase ELSE 0 END AS INT) AS level, x
         |  FROM raw),
         |counts AS (
         |  SELECT level, CAST(count(*) AS BIGINT) AS n_rows
         |  FROM lv GROUP BY 1),
         |spine AS (SELECT CAST(unnest(range(0, 21)) AS INT) AS level),
         |fullc AS (
         |  SELECT s.level, coalesce(c.n_rows, 0) AS n_rows
         |  FROM spine s LEFT JOIN counts c ON c.level = s.level),
         |suf AS (
         |  SELECT level,
         |    sum(n_rows) OVER (ORDER BY level DESC) AS suffix_n
         |  FROM fullc),
         |fl AS (
         |  SELECT CAST(coalesce(min(CASE WHEN suffix_n <= 256 THEN level END),
         |    20) AS INT) AS floor FROM suf),
         |ntot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n FROM counts),
         |kept AS (
         |  SELECT level, x, CAST(count(*) AS BIGINT) AS cnt
         |  FROM lv, fl WHERE level >= fl.floor GROUP BY 1, 2),
         |cum AS (
         |  SELECT x, cnt, CAST(sum(cnt) OVER (ORDER BY x
         |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum
         |  FROM kept),
         |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
         |  CAST(0.75 AS DOUBLE), CAST(0.9 AS DOUBLE),
         |  CAST(0.99 AS DOUBLE)]) AS q)
         |SELECT q,
         |  coalesce(min(CASE WHEN CAST(cum AS DOUBLE) * power(2, fl.floor)
         |      >= q * ntot.n THEN x END), max(x)) AS est,
         |  CAST(min(fl.floor) AS INT) AS floor,
         |  CAST(min(ntot.n) AS BIGINT) AS n,
         |  CAST(sum(cnt) AS BIGINT) AS n_kept
         |FROM cum, fl, ntot, qs GROUP BY q ORDER BY q""".stripMargin
    }

  def oracle: Map[String, String] = Map(
    "skew_report" ->
      """WITH counts AS (
        |  SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1),
        |stats AS (
        |  SELECT count(*) AS n_keys, max(cnt) AS max_cnt,
        |    round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
        |    round(CAST(sum(cnt) AS DOUBLE) / count(*), 4) AS avg_cnt
        |  FROM counts),
        |topk AS (
        |  SELECT cnt, l_orderkey FROM counts
        |  ORDER BY cnt DESC, l_orderkey LIMIT 5),
        |heavy AS (
        |  SELECT string_agg(l_orderkey || ':' || cnt, ','
        |    ORDER BY cnt DESC, l_orderkey) AS heavy_keys
        |  FROM topk)
        |SELECT n_keys, max_cnt, p99_cnt, avg_cnt,
        |  round(max_cnt / avg_cnt, 4) AS skew_ratio, heavy_keys
        |FROM stats, heavy""".stripMargin,

    // Tolerance-band contract: exact_orders replays in DuckDB; the
    // booleans are Spark-verified sketch-accuracy assertions the
    // oracle pins to TRUE (an out-of-band estimate flips them and
    // fails the hash). See the query's comment for the bands.
    "agg_approx" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS orders_in_band,
        |  TRUE AS median_in_band
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_incremental" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |    AS total_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "ivm_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |    AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "sketch_hll_distinct" -> {
      val cases = (0 until 20).map(i =>
        s"WHEN x >= ${1L << (19 - i)} THEN ${i + 1}").mkString("\n      ")
      s"""WITH hashed AS (
         |  SELECT md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem),
         |br AS (
         |  SELECT (${hexN("h", 1, 2)}) % 64 AS b,
         |    CASE $cases ELSE 21 END AS r
         |  FROM (SELECT h, (${hexN("h", 3, 5)}) AS x FROM hashed)),
         |regs AS (SELECT b, max(r) AS reg FROM br GROUP BY b),
         |agg AS (SELECT count(*) AS used, sum(power(2.0, -reg)) AS s FROM regs)
         |SELECT used, round(0.709 * 64 * 64 / (s + (64 - used)), 2) AS raw_est,
         |  (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS exact
         |FROM agg""".stripMargin
    },
    // full-scan builds: equality with the merged per-batch sketches
    // IS the merge≡full proof (CMS linearity / HLL register-max)
    "sketch_cms_merge" -> {
      val rows = (0 until 4).map(j =>
        s"SELECT ${if (j == 0) "0 AS j" else j},\n" +
          s"    (${hex4("md5(k)", j * 4 + 1)}) % 64 ${if (j == 0) "AS bucket" else ""} FROM src")
        .mkString("\n  UNION ALL ")
      val prows = (0 until 4).map(j =>
        s"SELECT key, ${if (j == 0) "0 AS j" else j},\n" +
          s"    (${hex4("md5(CAST(key AS VARCHAR))", j * 4 + 1)}) % 64 ${if (j == 0) "AS bucket" else ""} FROM probes")
        .mkString("\n  UNION ALL ")
      s"""WITH src AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
         |hashed AS (
         |  $rows),
         |cms AS (SELECT j, bucket, count(*) AS cnt FROM hashed GROUP BY 1, 2),
         |probes AS (SELECT DISTINCT o_custkey AS key FROM orders
         |           WHERE o_custkey <= 20),
         |pb AS (
         |  $prows),
         |est AS (
         |  SELECT p.key, min(coalesce(c.cnt, 0)) AS est
         |  FROM pb p LEFT JOIN cms c ON c.j = p.j AND c.bucket = p.bucket
         |  GROUP BY p.key),
         |exact AS (SELECT o_custkey AS key, count(*) AS exact
         |          FROM orders GROUP BY 1)
         |SELECT e.key, e.est, x.exact FROM est e JOIN exact x USING (key)
         |ORDER BY key""".stripMargin
    },
    "stats_bootstrap_ci" ->
      s"""WITH base AS (
         |  SELECT event_type, event_id,
         |    CAST(round(value, 4) AS DECIMAL(12,4)) AS v
         |  FROM events),
         |draws AS (
         |  SELECT event_type, event_id, v,
         |    unnest(generate_series(1, 100)) AS b
         |  FROM base),
         |um AS (
         |  SELECT event_type, b, v,
         |    (${hexN("md5(concat_ws('|', event_id, b))", 1, 8)})
         |      / 4294967296.0 AS u
         |  FROM draws),
         |mm AS (
         |  SELECT event_type, b, v,
         |    CASE WHEN u < 0.36787944117144233 THEN 0
         |         WHEN u < 0.7357588823428847 THEN 1
         |         WHEN u < 0.9196986029286058 THEN 2
         |         WHEN u < 0.9810118431238462 THEN 3
         |         WHEN u < 0.9963401531726563 THEN 4
         |         WHEN u < 0.9994058151824183 THEN 5
         |         ELSE 6 END AS m
         |  FROM um),
         |res AS (
         |  SELECT event_type, b,
         |    CASE WHEN sum(m) > 0 THEN
         |      CAST(sum(m * v) AS DOUBLE) / CAST(sum(m) AS DOUBLE)
         |    END AS mean_b
         |  FROM mm GROUP BY 1, 2)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_resamples,
         |  round(quantile_cont(mean_b, 0.025), 4) AS ci_lo,
         |  round(quantile_cont(mean_b, 0.975), 4) AS ci_hi
         |FROM res GROUP BY event_type ORDER BY event_type""".stripMargin,

    "dau_mau_stickiness" -> {
      val cases = (0 until 20).map(i =>
        s"WHEN x >= ${1L << (19 - i)} THEN ${i + 1}").mkString("\n      ")
      s"""WITH ev AS (
         |  SELECT CAST(ts AS DATE) AS d, user_id FROM events),
         |hashed AS (
         |  SELECT d, md5(CAST(user_id AS VARCHAR)) AS h FROM ev),
         |br AS (
         |  SELECT d, (${hexN("h", 1, 2)}) % 64 AS b,
         |    CASE $cases ELSE 21 END AS r
         |  FROM (SELECT d, h, (${hexN("h", 3, 5)}) AS x FROM hashed)),
         |daily AS (SELECT d, b, max(r) AS reg FROM br GROUP BY d, b),
         |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
         |spine AS (
         |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |    AS DATE) AS d, bb.b
         |  FROM span CROSS JOIN
         |    (SELECT unnest(generate_series(0, 63)) AS b) bb),
         |dense AS (
         |  SELECT s.d, s.b, daily.reg,
         |    datediff('day', DATE '1990-01-01', s.d) AS di
         |  FROM spine s LEFT JOIN daily ON daily.d = s.d AND daily.b = s.b),
         |roll AS (
         |  SELECT d, b,
         |    max(reg) OVER (PARTITION BY b ORDER BY di
         |      RANGE BETWEEN 27 PRECEDING AND CURRENT ROW) AS reg28
         |  FROM dense),
         |mau AS (
         |  SELECT d, count(reg28) AS used,
         |    sum(power(2.0, -reg28)) AS s
         |  FROM roll GROUP BY d),
         |dau AS (
         |  SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
         |  FROM ev GROUP BY d)
         |SELECT m.d, dau.dau,
         |  round(0.709 * 64 * 64 / (m.s + (64 - m.used)), 2) AS mau_est_28d,
         |  round(CAST(dau.dau AS DOUBLE) /
         |    (0.709 * 64 * 64 / (m.s + (64 - m.used))), 4) AS stickiness
         |FROM mau m JOIN dau ON dau.d = m.d ORDER BY m.d""".stripMargin
    },

    "sketch_hll_merge" -> {
      val cases = (0 until 20).map(i =>
        s"WHEN x >= ${1L << (19 - i)} THEN ${i + 1}").mkString("\n      ")
      s"""WITH hashed AS (
         |  SELECT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders),
         |br AS (
         |  SELECT (${hexN("h", 1, 2)}) % 64 AS b,
         |    CASE $cases ELSE 21 END AS r
         |  FROM (SELECT h, (${hexN("h", 3, 5)}) AS x FROM hashed)),
         |regs AS (SELECT b, max(r) AS reg FROM br GROUP BY b),
         |agg AS (SELECT count(*) AS used, sum(power(2.0, -reg)) AS s FROM regs)
         |SELECT used, round(0.709 * 64 * 64 / (s + (64 - used)), 2) AS raw_est,
         |  (SELECT count(DISTINCT o_custkey) FROM orders) AS exact
         |FROM agg""".stripMargin
    },

    "join_null_bypass" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |              ELSE o_custkey END AS k,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders)
        |SELECT coalesce(c_mktsegment, 'UNMATCHED') AS c_mktsegment,
        |  count(*) AS n_orders,
        |  round(CAST(sum(price) AS DOUBLE), 2) AS revenue
        |FROM o LEFT JOIN customer ON o.k = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sketch_bloom_merge" -> {
      // distinct bit positions over ALL keys = the set bits of both
      // the merged and the full filter; merge≡full is OR-linearity
      // (asserted TRUE here, computed from the real word arrays on
      // the Spark side — a broken merge fails the hash compare)
      val posUnion = (0 until 4).map(j =>
        s"""SELECT (${hexN("md5(CAST(o_custkey AS VARCHAR))", j * 4 + 1, 4)})
           |  % 4096 AS p FROM orders""".stripMargin).mkString("\nUNION\n")
      s"""WITH pos AS (
         |$posUnion)
         |SELECT CAST(64 AS INT) AS n_words, TRUE AS merge_equals_full,
         |  count(*) AS n_set_merged, count(*) AS n_set_full
         |FROM pos""".stripMargin
    },

    "hll_intersect" -> {
      val cases = (0 until 20).map(i =>
        s"WHEN x >= ${1L << (19 - i)} THEN ${i + 1}").mkString("\n      ")
      def regs(src: String, pfx: String) =
        s"""${pfx}h AS (
           |  SELECT md5(CAST(key AS VARCHAR)) AS h FROM $src),
           |${pfx}br AS (
           |  SELECT (${hexN("h", 1, 2)}) % 64 AS b,
           |    CASE $cases ELSE 21 END AS r
           |  FROM (SELECT h, (${hexN("h", 3, 5)}) AS x FROM ${pfx}h)),
           |${pfx}regs AS (SELECT b, max(r) AS reg FROM ${pfx}br GROUP BY b),
           |${pfx}est AS (
           |  SELECT round(0.709 * 64 * 64 /
           |    (sum(power(2.0, -reg)) + (64 - count(*))), 2) AS est
           |  FROM ${pfx}regs)""".stripMargin
      s"""WITH a0 AS (
         |  SELECT o_custkey AS key FROM orders WHERE year(o_orderdate) < 1997),
         |b0 AS (
         |  SELECT o_custkey AS key FROM orders WHERE year(o_orderdate) >= 1997),
         |${regs("a0", "a")},
         |${regs("b0", "b")},
         |uregs AS (
         |  SELECT b, max(reg) AS reg FROM (
         |    SELECT * FROM aregs UNION ALL SELECT * FROM bregs) GROUP BY b),
         |uest AS (
         |  SELECT round(0.709 * 64 * 64 /
         |    (sum(power(2.0, -reg)) + (64 - count(*))), 2) AS est
         |  FROM uregs),
         |exact AS (
         |  SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM (
         |    SELECT o_custkey FROM orders GROUP BY o_custkey
         |    HAVING max(CASE WHEN year(o_orderdate) < 1997 THEN 1 ELSE 0 END) = 1
         |       AND max(CASE WHEN year(o_orderdate) >= 1997 THEN 1 ELSE 0 END) = 1))
         |SELECT a.est AS est_a, b.est AS est_b, u.est AS est_union,
         |  round(a.est + b.est - u.est, 2) AS est_intersect, exact_intersect
         |FROM aest a, best b, uest u, exact""".stripMargin
    },
    "sketch_heavy_hitters" -> {
      val rows = (0 until 4).map(j =>
        s"SELECT ${if (j == 0) "0 AS j" else j},\n" +
          s"    (${hex4("md5(k)", j * 4 + 1)}) % 64 ${if (j == 0) "AS bucket" else ""} FROM src")
        .mkString("\n  UNION ALL ")
      val prows = (0 until 4).map(j =>
        s"SELECT key, ${if (j == 0) "0 AS j" else j},\n" +
          s"    (${hex4("md5(CAST(key AS VARCHAR))", j * 4 + 1)}) % 64 ${if (j == 0) "AS bucket" else ""} FROM probes")
        .mkString("\n  UNION ALL ")
      s"""WITH src AS (SELECT CAST(l_suppkey AS VARCHAR) AS k FROM lineitem),
         |hashed AS (
         |  $rows),
         |cms AS (SELECT j, bucket, count(*) AS cnt FROM hashed GROUP BY 1, 2),
         |probes AS (SELECT DISTINCT l_suppkey AS key FROM lineitem),
         |pb AS (
         |  $prows),
         |est AS (
         |  SELECT p.key, min(coalesce(c.cnt, 0)) AS est
         |  FROM pb p LEFT JOIN cms c ON c.j = p.j AND c.bucket = p.bucket
         |  GROUP BY p.key),
         |ranked AS (
         |  SELECT key, est,
         |    row_number() OVER (ORDER BY est DESC, key) AS rk
         |  FROM est),
         |exact AS (SELECT l_suppkey AS key, count(*) AS exact
         |          FROM lineitem GROUP BY 1)
         |SELECT r.key, r.est, x.exact
         |FROM ranked r JOIN exact x USING (key)
         |WHERE r.rk <= 10
         |ORDER BY r.est DESC, r.key""".stripMargin
    },

    // Full-scan replay of the grouped CMS — the query merges two
    // batch halves, so hash equality proves grouped merge ≡ full.
    // src is MATERIALIZED: six consumers would otherwise re-split
    // every document per reference.
    "sketch_hh_grouped" -> {
      val rows = (0 until 4).map(j =>
        s"SELECT lang, ${if (j == 0) "0 AS j" else j},\n" +
          s"    (${hex4("md5(k)", j * 4 + 1)}) % 64 ${if (j == 0) "AS bucket" else ""} FROM src")
        .mkString("\n  UNION ALL ")
      val prows = (0 until 4).map(j =>
        s"SELECT lang, term, ${if (j == 0) "0 AS j" else j},\n" +
          s"    (${hex4("md5(term)", j * 4 + 1)}) % 64 ${if (j == 0) "AS bucket" else ""} FROM probes")
        .mkString("\n  UNION ALL ")
      s"""WITH src AS MATERIALIZED (
         |  SELECT lang, unnest(${Curation.toksSql}) AS k FROM documents),
         |hashed AS (
         |  $rows),
         |cms AS (SELECT lang, j, bucket, count(*) AS cnt
         |        FROM hashed GROUP BY 1, 2, 3),
         |probes AS (SELECT DISTINCT lang, k AS term FROM src),
         |pb AS (
         |  $prows),
         |est AS (
         |  SELECT p.lang, p.term, min(coalesce(c.cnt, 0)) AS est
         |  FROM pb p LEFT JOIN cms c ON c.lang = p.lang AND c.j = p.j
         |    AND c.bucket = p.bucket
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT lang, term, est,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY est DESC, term) AS rk
         |  FROM est),
         |exact AS (SELECT lang, k AS term, count(*) AS exact
         |          FROM src GROUP BY 1, 2)
         |SELECT r.lang, r.term, r.est, x.exact
         |FROM ranked r JOIN exact x USING (lang, term)
         |WHERE r.rk <= 5
         |ORDER BY r.lang, r.est DESC, r.term""".stripMargin
    },

    "sketch_quantile" ->
      """WITH v AS (SELECT CAST(n_chars AS BIGINT) AS x FROM documents),
        |mm AS (
        |  SELECT min(x) AS lo,
        |    greatest(CAST(floor((max(x) - min(x)) / 128.0) AS BIGINT), 1) AS w
        |  FROM v),
        |bins AS (
        |  SELECT CAST(least(CAST(floor(CAST(x - lo AS DOUBLE)
        |      / CAST(w AS DOUBLE)) AS BIGINT), 127) AS INT) AS bin,
        |    count(*) AS cnt, min(lo) AS lo, min(w) AS w
        |  FROM v, mm GROUP BY 1),
        |cum AS (
        |  SELECT bin, cnt, lo, w,
        |    CAST(coalesce(sum(cnt) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_below,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS n
        |  FROM bins),
        |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |  CAST(0.75 AS DOUBLE), CAST(0.9 AS DOUBLE),
        |  CAST(0.99 AS DOUBLE)]) AS q)
        |SELECT q,
        |  round((lo + bin * w)
        |    + ((q * n - cum_below) / cnt) * w, 4) AS est,
        |  w AS err_bound
        |FROM cum, qs
        |WHERE cum_below < q * n AND q * n <= cum_below + cnt
        |ORDER BY q""".stripMargin,

    "sketch_kll" -> kllFullSql,

    // same SQL ON PURPOSE: merge-then-query must equal the full build
    "sketch_kll_merge" -> kllFullSql,

    // same SQL ON PURPOSE: the stored serve must equal the fresh build
    "sketch_kll_stored" -> kllFullSql,

    "sketch_kll_grouped" -> {
      val x20 = (1 to 5).map { i =>
        val mult = 1L << (4 * (5 - i))
        s"(strpos('0123456789abcdef', substr(md5(" +
          s"CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * $mult"
      }.mkString(" + ")
      val lvlCase = (20 to 1 by -1).map { f =>
        s"WHEN x20 >= ${(1L << 20) - (1L << (20 - f))} THEN $f"
      }.mkString(" ")
      s"""WITH raw AS (
         |  SELECT lang, $x20 AS x20, CAST(n_chars AS BIGINT) AS x
         |  FROM documents),
         |lv AS (
         |  SELECT lang, CAST(CASE $lvlCase ELSE 0 END AS INT) AS level, x
         |  FROM raw),
         |counts AS (
         |  SELECT lang, level, CAST(count(*) AS BIGINT) AS n_rows
         |  FROM lv GROUP BY 1, 2),
         |spine AS (SELECT CAST(unnest(range(0, 21)) AS INT) AS level),
         |fullc AS (
         |  SELECT g.lang, s.level, coalesce(c.n_rows, 0) AS n_rows
         |  FROM (SELECT DISTINCT lang FROM counts) g
         |  CROSS JOIN spine s
         |  LEFT JOIN counts c ON c.lang = g.lang AND c.level = s.level),
         |suf AS (
         |  SELECT lang, level,
         |    sum(n_rows) OVER (PARTITION BY lang ORDER BY level DESC)
         |      AS suffix_n
         |  FROM fullc),
         |fl AS (
         |  SELECT lang, CAST(coalesce(min(CASE WHEN suffix_n <= 64
         |    THEN level END), 20) AS INT) AS floor
         |  FROM suf GROUP BY lang),
         |ntot AS (
         |  SELECT lang, CAST(sum(n_rows) AS BIGINT) AS n
         |  FROM counts GROUP BY lang),
         |kept AS (
         |  SELECT l.lang, l.x, CAST(count(*) AS BIGINT) AS cnt
         |  FROM lv l JOIN fl ON fl.lang = l.lang
         |  WHERE l.level >= fl.floor GROUP BY 1, 2),
         |cum AS (
         |  SELECT lang, x, cnt, CAST(sum(cnt) OVER (PARTITION BY lang
         |    ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum
         |  FROM kept),
         |qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)])
         |  AS q)
         |SELECT c.lang, q,
         |  coalesce(min(CASE WHEN CAST(cum AS DOUBLE) * power(2, fl.floor)
         |      >= q * ntot.n THEN x END), max(x)) AS est,
         |  CAST(min(fl.floor) AS INT) AS floor,
         |  CAST(min(ntot.n) AS BIGINT) AS n,
         |  CAST(sum(cnt) AS BIGINT) AS n_kept
         |FROM cum c
         |JOIN fl ON fl.lang = c.lang
         |JOIN ntot ON ntot.lang = c.lang
         |CROSS JOIN qs
         |GROUP BY c.lang, q ORDER BY c.lang, q""".stripMargin
    },

    "quantile_grouped" ->
      """WITH v AS (SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents),
        |mm AS (
        |  SELECT lang, min(x) AS lo,
        |    greatest(CAST(floor((max(x) - min(x)) / 64.0) AS BIGINT), 1) AS w
        |  FROM v GROUP BY lang),
        |bins AS (
        |  SELECT v.lang,
        |    CAST(least(CAST(floor(CAST(x - lo AS DOUBLE)
        |      / CAST(w AS DOUBLE)) AS BIGINT), 63) AS INT) AS bin,
        |    count(*) AS cnt, min(mm.lo) AS lo, min(mm.w) AS w
        |  FROM v JOIN mm ON mm.lang = v.lang GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, bin, cnt, lo, w,
        |    CAST(coalesce(sum(cnt) OVER (PARTITION BY lang ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_below,
        |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM bins),
        |qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS q)
        |SELECT lang, q,
        |  round((lo + bin * w)
        |    + ((q * n - cum_below) / cnt) * w, 4) AS est,
        |  w AS err_bound
        |FROM cum, qs
        |WHERE cum_below < q * n AND q * n <= cum_below + cnt
        |ORDER BY lang, q""".stripMargin,

    "sketch_countmin" -> {
      val rows = (0 until 4).map(j =>
        s"SELECT ${if (j == 0) "0 AS j" else j},\n" +
          s"    (${hex4("md5(k)", j * 4 + 1)}) % 64 ${if (j == 0) "AS bucket" else ""} FROM src")
        .mkString("\n  UNION ALL ")
      val prows = (0 until 4).map(j =>
        s"SELECT key, ${if (j == 0) "0 AS j" else j},\n" +
          s"    (${hex4("md5(CAST(key AS VARCHAR))", j * 4 + 1)}) % 64 ${if (j == 0) "AS bucket" else ""} FROM probes")
        .mkString("\n  UNION ALL ")
      s"""WITH src AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
         |hashed AS (
         |  $rows),
         |cms AS (SELECT j, bucket, count(*) AS cnt FROM hashed GROUP BY 1, 2),
         |probes AS (SELECT DISTINCT l_partkey AS key FROM lineitem
         |           WHERE l_partkey <= 20),
         |pb AS (
         |  $prows),
         |est AS (
         |  SELECT p.key, min(coalesce(c.cnt, 0)) AS est
         |  FROM pb p LEFT JOIN cms c ON c.j = p.j AND c.bucket = p.bucket
         |  GROUP BY p.key),
         |exact AS (SELECT l_partkey AS key, count(*) AS exact
         |          FROM lineitem GROUP BY 1)
         |SELECT e.key, e.est, x.exact FROM est e JOIN exact x USING (key)
         |ORDER BY key""".stripMargin
    },
    "join_eliminated" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "cms_join_card" -> {
      val rows = (0 until 4).map(j =>
        s"SELECT ${if (j == 0) "0 AS j" else j},\n" +
          s"    (${hex4("md5(k)", j * 4 + 1)}) % 1024 ${if (j == 0) "AS bucket" else ""} FROM src")
        .mkString("\n  UNION ALL ")
      s"""WITH src AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
         |hashed AS (
         |  $rows),
         |cms AS (SELECT j, bucket, count(*) AS cnt FROM hashed GROUP BY 1, 2),
         |dots AS (
         |  SELECT a.j, sum(a.cnt * b.cnt) AS dot
         |  FROM cms a JOIN cms b ON a.j = b.j AND a.bucket = b.bucket
         |  GROUP BY a.j),
         |est AS (SELECT CAST(min(dot) AS BIGINT) AS est_rows FROM dots),
         |exact AS (
         |  SELECT CAST(sum(c * c) AS BIGINT) AS exact_rows FROM (
         |    SELECT count(*) AS c FROM lineitem GROUP BY l_partkey))
         |SELECT est_rows, exact_rows,
         |  round(est_rows * 1.0 / exact_rows, 4) AS ratio
         |FROM est CROSS JOIN exact""".stripMargin
    },

    "agg_salted" ->
      """SELECT o_orderpriority, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "join_salted" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "join_skew_auto" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "topk_global" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, rev,
        |    row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk
        |  FROM rev)
        |SELECT o_custkey, CAST(rev AS DOUBLE) AS revenue
        |FROM ranked WHERE rk <= 10
        |ORDER BY revenue DESC, o_custkey""".stripMargin,

    "topk_custom" ->
      """WITH rev AS (
        |  SELECT o_custkey, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT c_mktsegment, c_custkey, rev,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY rev DESC, c_custkey) AS rk
        |  FROM customer JOIN rev ON c_custkey = o_custkey)
        |SELECT c_mktsegment, c_custkey, round(rev, 2) AS revenue
        |FROM ranked WHERE rk <= 3
        |ORDER BY c_mktsegment, revenue DESC, c_custkey""".stripMargin,

    "topk_rewrite" ->
      """WITH rev AS (
        |  SELECT o_custkey, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT c_mktsegment, c_custkey, rev,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY rev DESC, c_custkey) AS rk
        |  FROM customer JOIN rev ON c_custkey = o_custkey)
        |SELECT c_mktsegment, c_custkey, round(rev, 2) AS revenue
        |FROM ranked WHERE rk <= 3
        |ORDER BY c_mktsegment, revenue DESC, c_custkey""".stripMargin,

    "resume_incremental" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events
        |WHERE ts > (SELECT max(ts) FROM events WHERE event_id < 500)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_mv_rewrite" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  max(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
}
