package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.PRound

/** Block G — analytics over the fact tables (SURVEY.md §2.G).
  *
  * These are the queries a user of the reference runs over its
  * long-format output CSV (revenue by year, growth, ratios —
  * README.md:188-239). All declarative: partial aggregation, broadcast
  * dims, pushdown-friendly projections. Doubles are rounded at the
  * edge so the DuckDB oracle hash-matches.
  */
object Analytics {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          PRound.pround(sum(col("l_quantity")), 2).as("sum_qty"),
          PRound.pround(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          PRound.pround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          PRound.pround(avg(col("l_quantity")), 4).as("avg_qty"),
          PRound.pround(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // RANGE-frame moving average (the VALUE-based frame the ROWS
    // moving_avg can't express): a 7-day trailing window over daily
    // revenue follows the CALENDAR — gaps in the day axis shrink the
    // frame instead of pulling in older rows.
    "moving_avg_range" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(col("o_orderdate"), lit("1995-01-01"))
          .cast("long").as("day"))
        .agg(sum(col("o_totalprice")).as("rev"))
      val w = Window.orderBy(col("day")).rangeBetween(-6, 0)
      // window over the RAW rev computed BEFORE the rounded-alias
      // projection: naming the rounded column "rev" in the same
      // select would make avg(rev) a lateral alias reference, which
      // the analyzer rejects inside a window (and the oracle's SQL
      // scoping averages the base column anyway)
      daily
        .withColumn("avg_7d", PRound.pround(avg(col("rev")).over(w), 2))
        .select(col("day"), PRound.pround(col("rev"), 2).as("rev"),
          col("avg_7d"))
        .orderBy(col("day"))
    },

    // One-pass column profiling (the ANALYZE/DESCRIBE shape every
    // warehouse exposes): per-column null count, exact distinct
    // count, min/max — ONE aggregation over the table, stacked to a
    // row per column. The exact multi-column distinct plans through
    // Expand (one input replica per distinct aggregate); at 100 TB
    // swap countDistinct for approx_count_distinct (HLL sketches,
    // mergeable, no Expand) — the plan shape is otherwise identical.
    "table_profile" -> { (s, dir) =>
      val cols = profileCols
      val aggs = cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))
      }
      val wide = Tables.orders(s, dir).agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c")
        .mkString(", ")
      wide.selectExpr(s"stack(${cols.size}, $stackArgs) " +
          "AS (column_name, n_nulls, n_distinct, min_value, max_value)")
        .orderBy(col("column_name"))
    },

    // The 100 TB profiling plan the exact variant's own doc comment
    // calls for: approx distinct on the native deterministic-HLL
    // TypedImperativeAggregate (functions.expr.HllEst) — ONE pass, no
    // Expand, every aggregate a mergeable 64-byte register buffer.
    // Still oracle-checkable: the oracle replays the md5 register math
    // and the linear-counting correction bit-for-bit.
    "table_profile_approx" -> { (s, dir) =>
      import org.apache.spark.sql.GraftBridge.{column, expression}
      def hllEst(c: org.apache.spark.sql.Column) =
        column(graft.functions.expr.HllEst(expression(c)).toAggregateExpression())
      val cols = profileCols
      val aggs = cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
          PRound.pround(hllEst(col(c).cast("string")), 2).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))
      }
      val wide = Tables.orders(s, dir).agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c")
        .mkString(", ")
      wide.selectExpr(s"stack(${cols.size}, $stackArgs) " +
          "AS (column_name, n_nulls, n_distinct_est, min_value, max_value)")
        .orderBy(col("column_name"))
    },

    // The grouped shape of the approx profile — per-segment distinct
    // cardinalities in ONE pass (what approx_count_distinct does on a
    // 100 TB fact table, on the oracle-checkable HLL): each group
    // carries two mergeable 64-byte register buffers, map-side
    // combined like any partial aggregate. Exercises the aggregate's
    // RAW estimation branch (per-group cardinalities sit above 2.5·m).
    "profile_grouped" -> { (s, dir) =>
      import org.apache.spark.sql.GraftBridge.{column, expression}
      def hllEst(c: org.apache.spark.sql.Column) =
        column(graft.functions.expr.HllEst(expression(c)).toAggregateExpression())
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          PRound.pround(hllEst(col("o_custkey").cast("string")), 2).as("nd_custkey_est"),
          PRound.pround(hllEst(col("o_orderdate").cast("string")), 2).as("nd_orderdate_est"),
          PRound.pround(min(col("o_totalprice")), 2).as("min_price"),
          PRound.pround(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("o_orderpriority"))
    },

    "agg_yearly" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      o.select(col("o_custkey"), col("o_totalprice"), year(col("o_orderdate")).as("o_year"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(PRound.pround(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"), col("o_year"))
    },

    "yoy_growth" -> { (s, dir) =>
      val yearly = Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("o_totalprice")).as("rev"))
      val w = Window.orderBy(col("o_year"))
      yearly
        .withColumn("prev", lag(col("rev"), 1).over(w))
        .select(col("o_year"), PRound.pround(col("rev"), 2).as("revenue"),
          PRound.pround((col("rev") - col("prev")) / col("prev") * 100, 4).as("growth_pct"))
        .orderBy(col("o_year"))
    },

    "topk_per_group" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val rev = Tables.orders(s, dir)
        .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("rev"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("rev").desc, col("c_custkey"))
      c.join(rev, col("c_custkey") === col("o_custkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_name"),
          PRound.pround(col("rev"), 2).as("revenue"))
        .orderBy(col("c_mktsegment"), col("rk"))
    },

    // Supplier-side star: lineitem revenue through the broadcast
    // supplier→nation dims, then the top-3 suppliers per nation on the
    // custom TopKPerKey operator.
    "supplier_topk" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val su = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      val perSupp = li
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("s_suppkey"))
        .agg(sum(col("rev")).as("rev"))
      graft.operators.TopK.perKey(perSupp, Seq("n_name"), "rev", "s_suppkey", 3)
        .select(col("n_name"), col("s_suppkey"),
          PRound.pround(col("rev"), 2).as("revenue"))
        .orderBy(col("n_name"), col("revenue").desc, col("s_suppkey"))
    },

    // Referential-integrity audit — the load-gate report a warehouse
    // runs before publishing a snapshot: orphan counts across the FK
    // chain (lineitem→orders, orders→customer, customer→nation) and
    // duplicate-key counts on each parent. Every leg is an anti-join
    // or a key-count agg (broadcastable parents broadcast); one row
    // out, so the gate is cheap to alert on.
    "integrity_check" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"))
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      def one(d: DataFrame, name: String) =
        d.agg(count(lit(1)).as(name))
      val orphanLi = one(li.join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti"), "orphan_lineitems")
      val orphanO = one(o.select(col("o_custkey")).join(
        broadcast(c.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti"), "orphan_orders")
      val orphanC = one(c.select(col("c_nationkey")).join(
        broadcast(n.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left_anti"), "orphan_customers")
      val dupO = one(o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("k"))
        .filter(col("k") > 1), "dup_orderkeys")
      val dupC = one(c.groupBy(col("c_custkey")).agg(count(lit(1)).as("k"))
        .filter(col("k") > 1), "dup_custkeys")
      orphanLi.crossJoin(orphanO).crossJoin(orphanC)
        .crossJoin(dupO).crossJoin(dupC)
    },

    // Market-basket co-occurrence: support counts for part pairs
    // bought in the same order. The pair expansion is an order-keyed
    // self-join — bounded by basket size (TPC-H baskets ≤ 7 lines),
    // the inverted-index shape the gram/band dedup family uses; at
    // any corpus scale the blowup dial is max basket size, never
    // corpus size.
    "basket_pairs" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val a = li.select(col("ok"), col("pk").as("p1"))
      val b = li.select(col("ok"), col("pk").as("p2"))
      a.join(b, Seq("ok")).filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .orderBy(col("p1"), col("p2"))
    },

    // RFM segmentation — the warehouse customer-scoring staple:
    // recency / frequency / monetary per customer, median-split into
    // 8 segments. The cuts are EXACT percentiles broadcast back (the
    // quality_adaptive shape) — never a global ntile window, whose
    // single-task sort dies at a billion customers; output is the
    // 8-row segment histogram.
    "orders_rfm" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val rfm = o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last"),
          count(lit(1)).as("freq"),
          PRound.pround(sum(col("o_totalprice")), 2).as("mon"))
      val mx = o.agg(max(to_date(col("o_orderdate"))).as("mx"))
      val scored = rfm.crossJoin(broadcast(mx))
        .select(col("o_custkey"), datediff(col("mx"), col("last")).as("rec"),
          col("freq"), col("mon"))
      val cuts = scored.agg(
        PRound.pround(expr("percentile(rec, 0.5)"), 4).as("rc"),
        PRound.pround(expr("percentile(freq, 0.5)"), 4).as("fc"),
        PRound.pround(expr("percentile(mon, 0.5)"), 4).as("mc"))
      scored.crossJoin(broadcast(cuts))
        .select(
          concat(lit("r"), (col("rec") <= col("rc")).cast("int"),
            lit("f"), (col("freq") >= col("fc")).cast("int"),
            lit("m"), (col("mon") >= col("mc")).cast("int")).as("segment"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("segment"))
    },

    "join_star" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))
      val r = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("o_year"))
        .agg(PRound.pround(sum(col("net")), 2).as("revenue"))
        .orderBy(col("r_name"), col("o_year"))
    },

    // TPC-H Q3 shape — the selective-dim multi-join top-k: the
    // segment filter shrinks customer BEFORE its broadcast (a
    // semi-join reduction on orders), both date filters push into the
    // parquet scans, the only real shuffle is lineitem⋈orders on the
    // order key, and the top-10 runs as TakeOrderedAndProject (no
    // global sort). Per-row net is cast to DECIMAL(18,4) before the
    // sum so the ranking key is exact under any partition order —
    // ranking on a double sum could flip the 10th row at ulp scale.
    "q3_shipping_priority" -> { (s, dir) =>
      val cutoff = lit("1995-03-15").cast("timestamp")
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_orderpriority"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("net"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("net")).cast(DecimalType(28, 4)).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q2 shape — the correlated-min (argmin) join: the cheapest
    // supplier PER PART among filtered parts. Unit costs aggregate
    // once from the fact, the argmin is a per-part rank window with a
    // deterministic tie-break (cost, then suppkey), dims broadcast,
    // top-20 via TakeOrdered. The classic decorrelation: never a
    // per-part MIN subquery re-executed per row.
    "q2_min_cost_supplier" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val cost = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(PRound.pround(col("l_extendedprice") / col("l_quantity"), 4))
          .as("unit_cost"))
      val p = Tables.part(s, dir)
        .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_name"))
      val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("unit_cost"), col("l_suppkey"))
      cost.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_name"), col("s_name"), col("unit_cost"))
        .orderBy(col("unit_cost"), col("p_name"))
        .limit(20)
    },

    // TPC-H Q4 shape — priority census of orders with at least one
    // flagged line (returnflag R stands in for the generator's
    // commit<receipt lateness): ONE semi join on the order key (the
    // EXISTS decorrelation — the fact is never duplicated per match),
    // date range pushed to the orders scan.
    "q4_order_priority" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderpriority"))
      val flagged = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      o.join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q7 shape — cross-nation trade volume: revenue between one
    // nation pair (either direction) by ship year. Every dim
    // (supplier/customer/nation×2) broadcasts; the only real shuffle
    // is lineitem⋈orders on the order key; the direction disjunction
    // evaluates on broadcast-joined columns, never as a cross product.
    // The sum is exact (per-row DECIMAL(18,4)); presentation is the
    // driver-portable long/pround-double surface — r8 proved raw
    // DECIMAL output columns trip the driver's type-aware hash even
    // when values are bit-identical under the local DuckDB.
    "q7_nation_volume" -> { (s, dir) =>
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("net"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("ck"))
        .join(broadcast(n2), col("s_nationkey") === col("sk"))
        .filter(
          (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_10") ||
          (col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_12"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(PRound.pround(sum(col("net")).cast("double"), 2).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q8 shape — national market share: NATION_2 suppliers'
    // slice of ECONOMY-part revenue sold into ASIA customers, by
    // order year. Numerator and denominator ride ONE conditional
    // aggregate (never two passes); the share division happens once
    // on the exact DECIMAL sums.
    "q8_market_share" -> { (s, dir) =>
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("ck"))
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      val sn = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("net"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("ck"), "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sk"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_2", col("net"))
            .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 4))))
            .as("nr_dec"),
          sum(col("net")).as("tr_dec"))
        .select(col("o_year").cast("long").as("o_year"),
          PRound.pround(col("nr_dec").cast("double"), 2).as("nation_revenue"),
          PRound.pround(col("tr_dec").cast("double"), 2).as("total_revenue"),
          PRound.pround(col("nr_dec").cast("double")
            / col("tr_dec").cast("double"), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // TPC-H Q9 shape — product-line profit by supplier nation and
    // year. This dataset has no partsupp supplycost; the documented
    // stand-in is a 50%-of-list COGS, so profit = extprice·(0.5 −
    // discount) — the plan shape (name-filtered part broadcast, one
    // fact-fact shuffle, nation rollup) is Q9's regardless.
    "q9_product_profit" -> { (s, dir) =>
      val p = Tables.part(s, dir).filter(col("p_name").contains("widget"))
        .select(col("p_partkey"))
      val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      val sn = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sk"), col("n_name").as("nation"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(0.5) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("profit"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sk"))
        .groupBy(col("nation"), col("o_year"))
        .agg(PRound.pround(sum(col("profit")).cast("double"), 2)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q11 shape — important stock: parts whose shipped value
    // from NATION_3 suppliers exceeds a fraction of that nation's
    // total (the GROUP BY ... HAVING > scalar-subquery shape: the
    // 1-row total broadcasts, never a re-scan). DECIMAL value keeps
    // the descending order exact.
    "q11_important_stock" -> { (s, dir) =>
      val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      val sn = Tables.nation(s, dir).filter(col("n_name") === "NATION_3")
        .select(col("n_nationkey").as("sk"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice").cast(DecimalType(18, 2)).as("v"))
      val natLines = li
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sk"), "left_semi")
      val perPart = natLines.groupBy(col("l_partkey"))
        .agg(sum(col("v")).cast(DecimalType(28, 2)).as("value_dec"))
      val total = perPart
        .agg(sum(col("value_dec")).cast(DecimalType(38, 2)).as("t"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_dec").cast("double") > col("t").cast("double") * 0.002)
        .select(col("l_partkey").as("p_partkey"),
          PRound.pround(col("value_dec").cast("double"), 2).as("value"))
        .orderBy(col("value").desc, col("p_partkey"))
    },

    // TPC-H Q13 shape — customer order-count distribution INCLUDING
    // the zero-order customers (the LEFT join Q13 exists to test):
    // count per customer, then a histogram of the counts — two
    // map-side-combinable aggregations, the second over |customers|
    // rows.
    "q13_order_distribution" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_custkey"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q15 shape — top supplier(s): quarterly revenue per
    // supplier, keep those EQUAL to the maximum (the CREATE VIEW +
    // scalar max shape; the 1-row max broadcasts and DECIMAL equality
    // is exact, so ties surface instead of flapping).
    "q15_top_supplier" -> { (s, dir) =>
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast(DecimalType(28, 4)).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q17 shape — small-quantity revenue: lines of one part
    // group below 20% of their part's average quantity. The
    // correlated avg decorrelates to ONE per-part aggregate joined
    // back (never a subquery per row); the avg is exact
    // (DECIMAL sum / count) so the < comparison cannot flip engines.
    "q17_small_quantity" -> { (s, dir) =>
      val p = Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#11" && col("p_size") === 5)
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice").cast(DecimalType(18, 2)).as("price"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val avgQty = li.groupBy(col("l_partkey").as("pk"))
        .agg((sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
          / count(lit(1))).as("avg_qty"))
      li.join(avgQty, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .agg(PRound.pround(sum(col("price")).cast("double") / 7.0, 2)
          .as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q20 shape — excess-stock suppliers: NATION_8 suppliers
    // where some PROMO part's 1996 shipments exceed 30% of that
    // (part, supplier)'s all-time quantity. The correlated threshold
    // decorrelates to one conditional aggregate per (part, supplier);
    // the supplier list is then a semi join — the nested-EXISTS chain
    // as two flat hops.
    "q20_excess_stock" -> { (s, dir) =>
      val promo = Tables.part(s, dir).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, dir)
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast(DecimalType(18, 2)).as("qty"),
          (year(col("l_shipdate")) === 1996).as("in96"))
      val ps = li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(when(col("in96"), col("qty"))
          .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))))
          .cast("double").as("qty96"),
          sum(col("qty")).cast("double").as("qty_all"))
        .filter(col("qty96") > col("qty_all") * 0.3)
        .select(col("l_suppkey")).distinct()
      val sn = Tables.nation(s, dir).filter(col("n_name") === "NATION_8")
        .select(col("n_nationkey").as("sk"))
      Tables.supplier(s, dir)
        .join(broadcast(sn), col("s_nationkey") === col("sk"), "left_semi")
        .join(ps, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q12 shape (l_returnflag stands in for the generator's
    // l_shipmode, which this dataset lacks): ONE fact-fact shuffle
    // join with both sides projected to their join key + one column,
    // date range as pushable literals, conditional counts in a single
    // map-side-combinable aggregate — never two joins or a pivot.
    "q12_shipmode" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_returnflag").isin("A", "R"))
        .select(col("l_orderkey"), col("l_returnflag"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
            .otherwise(1)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },

    // TPC-H Q14: promo revenue share. The part dim is broadcast; the
    // share division happens once on the two DECIMAL-exact sums (the
    // conditional sum + total ride the SAME aggregate — one fact
    // scan, one broadcast join, zero shuffles of the fact).
    "q14_promo" -> { (s, dir) =>
      val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_partkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("net"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("net"))
            .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 4))))
            .cast(DecimalType(28, 4)).as("promo_revenue"),
          sum(col("net")).cast(DecimalType(28, 4)).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          PRound.pround(lit(100.0) * col("promo_revenue").cast("double")
            / col("total_revenue").cast("double"), 4).as("promo_share_pct"))
    },

    // TPC-H Q19 shape: the DISJUNCTIVE-predicate probe. The filter is
    // an OR of per-branch (brand, size, quantity) conjunctions;
    // Catalyst must derive the branch-independent ranges and push an
    // Or filter into BOTH scans (plan-gated) instead of evaluating the
    // whole disjunction post-join — the difference between scanning 3
    // brands' row groups and scanning the table.
    "q19_disjunctive" -> { (s, dir) =>
      val p = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("net"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("net")).cast(DecimalType(28, 4)).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q21 shape: suppliers who were the ONLY failing supplier on
    // multi-supplier orders (returnflag R stands in for the generator's
    // receipt>commit lateness). One semi join (another supplier shipped
    // the order) + one anti join (no OTHER supplier failed it) — both
    // keyed on the order, both against projected two-column frames —
    // then a broadcast supplier lookup and a top-20 TakeOrdered.
    "q21_suppliers_waiting" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val fails = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val otherFails = fails.select(col("ok").as("ok3"), col("sk").as("sk3"))
      val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
      fails
        .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"),
          "left_semi")
        .join(otherFails, col("ok") === col("ok3") && col("sk") =!= col("sk3"),
          "left_anti")
        .join(broadcast(sup), col("sk") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // TPC-H Q22 shape: positive-balance customers above the GLOBAL
    // average balance who went dark (no orders since 2000) — a
    // scalar-subquery broadcast (one row) + an anti join against the
    // date-filtered orders key projection (the filter pushes into the
    // scan). The average is exact (2-dp DECIMAL sum / count), so the
    // > comparison cannot flip between engines.
    "q22_global_sales" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"),
          col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
      val avgBal = c.filter(col("bal") > 0)
        .agg((sum(col("bal")).cast("double") / count(lit(1))).as("avg_bal"))
      val ok = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.join(ok, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter(col("bal").cast("double") > col("avg_bal"))
        .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          PRound.pround(sum(col("bal")).cast("double"), 2).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    },

    // TPC-H Q16 shape: distinct-supplier census per part attribute
    // with a complaints exclusion list. The (part, supplier) relation
    // is the distinct projection of lineitem (this dataset has no
    // partsupp); the exclusion is an anti join against the small
    // supplier side, the part dim is broadcast, and the distinct
    // count shuffles only (brand, type, size, suppkey) — fixed-width
    // keys, no fact columns.
    "q16_parts_supplier" -> { (s, dir) =>
      val excl = Tables.supplier(s, dir)
        .filter(col("s_suppkey") % 10 === 0).select(col("s_suppkey"))
      val p = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#45" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val ps = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      ps.join(excl, ps("l_suppkey") === excl("s_suppkey"), "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Pareto frontier of customers on (order count, avg order value) —
    // the skyline operator (non-dominated set). NOT the quadratic
    // NOT-EXISTS formulation: points pre-aggregate to one (x, max y)
    // row per distinct x, then a single descending-x sweep keeps a
    // point iff its y beats the strict-suffix max — O(|distinct x|)
    // after the keyed aggs, and the global window runs over the
    // x-cardinality-bounded aggregate, never raw rows (the
    // running_total posture). The per-customer average derives from
    // an exact DECIMAL sum, so both engines round identical doubles.
    "pareto_front" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val cust = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          PRound.pround(
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
              / count(lit(1)), 2).as("avg_order"))
      val perX = cust.groupBy(col("n_orders"))
        .agg(max(col("avg_order")).as("ymax"))
      val sweep = Window.orderBy(col("n_orders").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      perX
        .withColumn("t_strict", max(col("ymax")).over(sweep))
        .filter(col("t_strict").isNull || col("ymax") > col("t_strict"))
        .select(col("n_orders"), col("ymax").as("max_avg_order"))
        .orderBy(col("n_orders"))
    },

    // TPC-H Q5 shape — local-supplier revenue per nation inside one
    // region/year: the 6-way star probe. Lineitem (the fact) never
    // broadcasts; supplier/customer key-join it while nation×region
    // broadcast into both dims. The c_nationkey = s_nationkey
    // equality rides the join keys (no post-filter over a wider
    // join). DECIMAL(18,4) net so the revenue sum is
    // partition-order-exact.
    "q5_local_supplier" -> { (s, dir) =>
      val n = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val c = Tables.customer(s, dir)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("net"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("net")).cast(DecimalType(28, 4)).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q18 shape — large-volume orders: the groupBy-HAVING
    // semi-join. The qualifying-order set derives from ONE lineitem
    // aggregation reused as a left-semi probe (never IN-subquery
    // row-at-a-time), then the detail re-aggregates only qualifying
    // orders. Quantities are integral, so the sum rides exact BIGINT
    // arithmetic end to end and the 300 cut cannot flip engines.
    "q18_large_orders" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("qty")).as("total_qty"))
        .filter(col("total_qty") > 300)
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          PRound.pround(col("o_totalprice"), 2).as("o_totalprice"),
          col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // TPC-H Q6 shape — the pure-pushdown probe: every predicate
    // (date range, discount band, quantity cap) reaches the parquet
    // scan as a PushedFilter, the plan is scan → map-side partial
    // agg → 1-row combine; zero joins, zero wide shuffles. DECIMAL
    // product so the single sum is partition-order-exact.
    "q6_forecast_revenue" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast(DecimalType(18, 4))).cast(DecimalType(28, 4)).as("revenue"))
    },

    // TPC-H Q10 shape — returned-item losses per customer in one
    // quarter: top-20 by exact DECIMAL revenue via
    // TakeOrderedAndProject (never a global sort); the returnflag +
    // date filters push to both scans, customer/nation broadcast.
    "q10_returned_items" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("net"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(PRound.pround(sum(col("net")).cast("double"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Set operators: customers ordering in BOTH 1995 and 1996
    // (INTERSECT) minus those who also ordered in 1997 (EXCEPT).
    "set_ops" -> { (s, dir) =>
      def buyers(y: Int) = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey")).distinct()
      buyers(1995).intersect(buyers(1996)).except(buyers(1997))
        .orderBy(col("o_custkey"))
    },

    // CUBE grouping sets — all four (priority × status) margins.
    "cube_multi" -> { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          PRound.pround(sum(col("o_totalprice")), 2).as("revenue"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("revenue"))
        .orderBy(col("priority"), col("status"))
    },

    // ntile quartiles per segment, then per-quartile bounds — the
    // "score distribution by cohort" shape.
    "ntile_quartiles" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        .withColumn("quartile", ntile(4).over(w))
        .groupBy(col("c_mktsegment"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          PRound.pround(min(col("c_acctbal")), 2).as("lo"),
          PRound.pround(max(col("c_acctbal")), 2).as("hi"))
        .orderBy(col("c_mktsegment"), col("quartile"))
    },

    "rollup_multi" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
      o.select(col("o_custkey"), col("o_totalprice"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(PRound.pround(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("revenue"), col("n_orders"))
        .orderBy(col("region"), col("nation"))
    },

    // ABC / Pareto classification of parts by revenue share (round
    // 11) — the inventory-policy staple ("A items get daily counts, C
    // items get yearly"): parts ranked by revenue, class from the
    // RUNNING share of total (A ≤ 70%, B ≤ 90%, C the tail). The
    // running sum over a DATA-SIZED dimension is exactly the
    // single-task global-window trap — this rides
    // Cumsum.globalRunning's two-phase distributed scan instead
    // (range-partitioned sort, per-partition windows, broadcast
    // offsets; plan-gated: no empty-partition window, no
    // SinglePartition exchange). Revenue pre-rounded to exact DECIMAL
    // so the cumsum is order-independent; (rev desc, partkey) is a
    // total order so the prefix is unambiguous.
    "abc_parts" -> { (s, dir) =>
      import graft.operators.Cumsum
      // per-row contributions pre-rounded into DECIMAL so the group
      // sum, the cumsum, and the grand total are all exact and
      // order-independent (double sums would drift in ulps across
      // partition orders)
      val rev = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(PRound.pround(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")), 4).cast("decimal(18,4)"))
          .as("rev"))
      val tot = rev.agg(sum(col("rev")).as("tot"))
      val cum = Cumsum.globalRunning(rev,
        Seq(col("rev").desc, col("pk")), col("rev"), "cum")
      val share = col("cum").cast("double") / col("tot").cast("double")
      cum.crossJoin(broadcast(tot))
        .select(col("pk"), col("rev").cast("double").as("revenue"),
          PRound.pround(share, 6).as("cum_share"),
          when(share <= 0.7, "A").when(share <= 0.9, "B").otherwise("C")
            .as("abc"))
        .orderBy(col("pk"))
    },

    "running_total" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(col("o_totalprice")).as("rev"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("d"), PRound.pround(col("rev"), 2).as("revenue"),
          PRound.pround(sum(col("rev")).over(w), 2).as("cum_revenue"))
        .orderBy(col("d"))
    },

    // correlated-subquery pattern: orders above their customer's mean
    // order value — decorrelated to a window average (one shuffle).
    "above_avg" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
      Tables.orders(s, dir)
        .withColumn("cust_avg", avg(col("o_totalprice")).over(w))
        .filter(col("o_totalprice") > col("cust_avg"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_above"),
          PRound.pround(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("o_custkey"))
    },

    // ordered string aggregation (deterministic: sorted before join)
    "group_concat" -> { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_acctbal") > 9000)
        .groupBy(col("c_mktsegment"))
        .agg(array_join(array_sort(collect_list(col("c_name"))), ",").as("names"),
          count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    },

    "moving_avg" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(col("o_totalprice")).as("rev"))
      val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
      daily.select(col("d"), PRound.pround(col("rev"), 2).as("revenue"),
          PRound.pround(avg(col("rev")).over(w), 4).as("ma7"))
        .orderBy(col("d"))
    },

    "exact_distinct" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },

    // Ranking-window breadth: percent_rank / cume_dist / lead in one
    // pass. Sort keys are INTEGERS (count, year) — ordering by a
    // float sum would be engine-ulp-dependent.
    "window_funcs" -> { (s, dir) =>
      val yearly = Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_orders"))
      val w = Window.orderBy(col("n_orders"), col("yr"))
      val wl = Window.orderBy(col("yr"))
      yearly.select(col("yr"), col("n_orders"),
          PRound.pround(percent_rank().over(w), 4).as("pct_rank"),
          PRound.pround(cume_dist().over(w), 4).as("cume"),
          lead(col("n_orders"), 1).over(wl).as("next_n"))
        .orderBy(col("yr"))
    },

    // Explicit GROUPING SETS (the general form rollup/cube specialize)
    // through the SQL surface.
    "grouping_sets" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
        .createOrReplaceTempView("graft_gs_lineitem")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS rf,
          |  coalesce(l_linestatus, 'ALL') AS ls,
          |  sum(l_quantity) AS sum_qty, count(*) AS n_rows
          |FROM graft_gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY rf, ls""".stripMargin)
    },

    "percentiles" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          PRound.pround(expr("percentile(value, 0.25)"), 4).as("p25"),
          PRound.pround(expr("percentile(value, 0.5)"), 4).as("p50"),
          PRound.pround(expr("percentile(value, 0.75)"), 4).as("p75"),
          PRound.pround(min(col("value")), 2).as("vmin"),
          PRound.pround(max(col("value")), 2).as("vmax"))
        .orderBy(col("event_type"))
    },

    // Shannon-entropy column profile — the information-content
    // companion to table_profile (a near-zero-entropy column is a
    // constant in disguise; a near-log2(n) one is a key). Each leg is
    // one map-side-combined value-count agg over its own pruned
    // column; the entropy fold then runs over the COUNTED values
    // (|distinct| rows, not |table|), with the 1-row total broadcast.
    // Full-scan work is one count per column at any corpus scale.
    "entropy_profile" -> { (s, dir) =>
      def leg(name: String): DataFrame = {
        val vc = Tables.orders(s, dir)
          .groupBy(col(name).as("v")).agg(count(lit(1)).as("cnt"))
        val tot = vc.agg(sum(col("cnt")).as("total"),
          count(lit(1)).as("nd"), max(col("cnt")).as("mx"))
        val p = col("cnt").cast("double") / col("total")
        vc.crossJoin(broadcast(tot))
          .agg(first(col("nd")).as("n_distinct"),
            PRound.pround(-sum(p * log(2.0, p)), 6).as("entropy_bits"),
            PRound.pround(first(col("mx")).cast("double") /
              first(col("total")), 6).as("top_share"))
          .select(lit(name).as("column_name"), col("n_distinct"),
            col("entropy_bits"), col("top_share"))
      }
      leg("o_orderstatus").unionAll(leg("o_orderpriority"))
        .orderBy(col("column_name"))
    },

    // Winsorized robust stats: clip value to the exact per-type
    // [p05, p95] band and report the clipped mean + clip counts — the
    // outlier-robust preprocessing step every metrics/feature pipeline
    // runs before averaging heavy-tailed values. Same plan shape as
    // anomaly_mad: one exact-percentile agg per type broadcast back,
    // then a map-side clip + rollup (never a global sort). Cuts are
    // rounded to 4dp BEFORE comparison so both engines clip at the
    // identical boundary; the clipped mean runs through DECIMAL so the
    // sum is partition-order-exact.
    "winsorize" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val cuts = ev.groupBy(col("event_type"))
        .agg(PRound.pround(expr("percentile(value, 0.05)"), 4).as("lo"),
          PRound.pround(expr("percentile(value, 0.95)"), 4).as("hi"))
      ev.join(broadcast(cuts), Seq("event_type"))
        .withColumn("clipped",
          least(greatest(col("value"), col("lo")), col("hi")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          PRound.pround(
            (sum(round(col("clipped"), 4).cast("decimal(18,6)")) /
              count(lit(1))).cast("double"), 4).as("avg_winsorized"),
          sum((col("value") < col("lo")).cast("long")).as("n_clip_lo"),
          sum((col("value") > col("hi")).cast("long")).as("n_clip_hi"),
          max(col("lo")).as("lo"), max(col("hi")).as("hi"))
        .orderBy(col("event_type"))
    },

    // winsorize's SERVE topology (VERDICT r11 #5): the [p05, p95] cut
    // frame builds AT MOST ONCE per dataset generation into the
    // content-keyed DatasetCache (operators.ThresholdStore — geometry
    // in the artifact name) and the clip pass broadcast-joins the
    // stored frame — zero percentile aggregates on the serve path
    // (plan-gated). Stored cuts are bit-identical to the fresh build
    // (deterministic exact percentiles + 4dp rounding), so the shared
    // winsorize oracle proves serve ≡ build.
    "winsorize_stored" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val cuts = graft.operators.ThresholdStore.storedCuts(
        s, dir, Seq("events.parquet"), "winsor_cuts", ev,
        Seq("event_type"), "value", Seq("lo" -> 0.05, "hi" -> 0.95), dp = 4)
      ev.join(broadcast(cuts), Seq("event_type"))
        .withColumn("clipped",
          least(greatest(col("value"), col("lo")), col("hi")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          PRound.pround(
            (sum(round(col("clipped"), 4).cast("decimal(18,6)")) /
              count(lit(1))).cast("double"), 4).as("avg_winsorized"),
          sum((col("value") < col("lo")).cast("long")).as("n_clip_lo"),
          sum((col("value") > col("hi")).cast("long")).as("n_clip_hi"),
          max(col("lo")).as("lo"), max(col("hi")).as("hi"))
        .orderBy(col("event_type"))
    },

    // Pearson correlation matrix over the fact measures — the feature-
    // selection / drift-debug staple. ONE map-side-combined pass
    // computes every moment (n, Σx, Σx², Σxy for all three pairs) as
    // EXACT DECIMAL sums — the 2-dp inputs are exact at scale 4, so
    // products at scale 8 are exact integers and the sums are
    // partition-order-proof; the corr formula then runs in double on
    // the 1-row moment frame, identical expression both engines. The
    // matrix unpivots via explode of the tiny struct array — the fact
    // table is scanned exactly once.
    "corr_matrix" -> { (s, dir) =>
      // integer units (quantity ×1 — it's integral; price/discount
      // ×100 — they're 2-dp): every moment is an exact integer sum
      // (products ride a DECIMAL(38,0) cast so the price² sum can't
      // overflow a long), so both engines hand the double formula
      // bit-identical inputs. Pearson is scale-invariant, so the
      // unit change doesn't alter the statistic.
      val su = (a: Column, b: Column) => sum((a * b).cast("decimal(38,0)"))
      val w = Tables.lineitem(s, dir)
        .select(col("l_quantity").cast("long").as("q"),
          round(col("l_extendedprice") * 100).cast("long").as("p"),
          round(col("l_discount") * 100).cast("long").as("dc"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("q")).cast("double").as("sq"),
          sum(col("p")).cast("double").as("sp"),
          sum(col("dc")).cast("double").as("sd"),
          su(col("q"), col("q")).cast("double").as("sqq"),
          su(col("p"), col("p")).cast("double").as("spp"),
          su(col("dc"), col("dc")).cast("double").as("sdd"),
          su(col("q"), col("p")).cast("double").as("sqp"),
          su(col("q"), col("dc")).cast("double").as("sqd"),
          su(col("p"), col("dc")).cast("double").as("spd"))
      def corr(sxy: String, sx: String, sy: String, sxx: String, syy: String) =
        PRound.pround(
          (col("n") * col(sxy) - col(sx) * col(sy)) /
            (sqrt(col("n") * col(sxx) - col(sx) * col(sx)) *
              sqrt(col("n") * col(syy) - col(sy) * col(sy))), 4)
      w.select(explode(array(
          struct(lit("l_quantity").as("col_x"), lit("l_extendedprice").as("col_y"),
            corr("sqp", "sq", "sp", "sqq", "spp").as("corr")),
          struct(lit("l_quantity").as("col_x"), lit("l_discount").as("col_y"),
            corr("sqd", "sq", "sd", "sqq", "sdd").as("corr")),
          struct(lit("l_extendedprice").as("col_x"), lit("l_discount").as("col_y"),
            corr("spd", "sp", "sd", "spp", "sdd").as("corr")))).as("r"))
        .select(col("r.col_x"), col("r.col_y"), col("r.corr"))
        .orderBy(col("col_x"), col("col_y"))
    },

    // Long-tail category collapse: brands below 4% share fold into
    // 'OTHER' — the cardinality-control step before one-hot features
    // or per-category models. The full-data pass is one map-side
    // count; the collapse decision runs on the vocab-sized count
    // frame with the 1-row total broadcast (at serving, the resulting
    // mapping broadcasts back over the raw rows as a map-side
    // replace). RELATIVE threshold on purpose — an absolute count
    // would mean different categories at every corpus scale.
    "category_collapse" -> { (s, dir) =>
      val counts = Tables.part(s, dir)
        .groupBy(col("p_brand")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      counts.crossJoin(broadcast(total))
        .select(when(col("cnt") < col("total") * 0.04, lit("OTHER"))
          .otherwise(col("p_brand")).as("category"), col("cnt"))
        .groupBy(col("category"))
        .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_merged"))
        .orderBy(col("category"))
    },

    // Benford first-digit audit of the money column — the
    // fabricated-data / load-corruption screen auditors run on every
    // financial fact table. First digits come from EXACT integer
    // money units (×100, leading digit is shift-invariant) via string
    // arithmetic — never float log10, whose 10^k edge cases differ
    // across engines. One map-side 9-key count; expected shares are
    // log10(1+1/d) computed identically both sides; the chi² fold
    // runs over the SORTED 9-row list (deterministic order, the Pca
    // sorted-fold trick) on 4-dp-rounded contributions.
    "benford_audit" -> { (s, dir) =>
      val firstDigit = substring(
        round(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
        .cast("int")
      val counts = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 0)
        .groupBy(firstDigit.as("d")).agg(count(lit(1)).as("n_obs"))
      val tot = counts.agg(sum(col("n_obs")).cast("double").as("total"))
      val pb = log10(lit(1.0) + lit(1.0) / col("d"))
      val per = counts.crossJoin(broadcast(tot))
        .select(col("d"), col("n_obs"),
          PRound.pround(col("n_obs") / col("total"), 4).as("p_obs"),
          PRound.pround(pb, 4).as("p_benford"),
          PRound.pround(
            (col("n_obs") - col("total") * pb) * (col("n_obs") - col("total") * pb) /
              (col("total") * pb), 4).as("chi2_contrib"))
      val chi2 = per
        .agg(sort_array(collect_list(struct(col("d"), col("chi2_contrib"))))
          .as("cs"))
        .select(PRound.pround(aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("chi2_contrib")), 3).as("chi2"))
      per.crossJoin(broadcast(chi2)).orderBy(col("d"))
    },

    // Closed-form OLS trend per nation over its yearly revenue
    // series, plus the next-year extrapolation — the planning
    // forecast every finance warehouse runs. Sums feeding the
    // slope are EXACT: years in BIGINT, 2-dp-rounded revenues in
    // DECIMAL(18,2) — so both engines do identical IEEE arithmetic
    // on identical inputs (no fp-accumulation-order drift). Two
    // keyed aggs, dims broadcast; nothing global.
    "forecast_linear" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      val yearly = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_totalprice"),
          year(col("o_orderdate")).as("o_year"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(PRound.pround(sum(col("o_totalprice")), 2).as("revenue"))
      yearly
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_years"),
          sum(col("o_year").cast("long")).as("sx"),
          sum((col("o_year") * col("o_year")).cast("long")).as("sxx"),
          sum(col("revenue").cast("decimal(18,2)")).cast("double").as("sy"),
          sum(col("revenue").cast("decimal(18,2)") * col("o_year"))
            .cast("double").as("sxy"),
          max(col("o_year")).as("last_year"))
        .filter(col("n_years") >= 2)
        .withColumn("slope",
          (col("n_years") * col("sxy") - col("sx") * col("sy")) /
            (col("n_years") * col("sxx") - col("sx") * col("sx")))
        .withColumn("icept", (col("sy") - col("slope") * col("sx")) / col("n_years"))
        .select(col("n_name"), col("n_years"),
          PRound.pround(col("slope"), 4).as("slope"),
          PRound.pround(col("icept"), 2).as("intercept"),
          PRound.pround(col("slope") * (col("last_year") + 1) + col("icept"), 2)
            .as("pred_next"))
        .orderBy(col("n_name"))
    },

    // Welch's t-test per event type between the two experiment arms
    // (user_id parity = the deterministic assignment) — the A/B
    // analysis every experimentation warehouse runs. ONE conditional
    // map-side-combined agg computes both arms' exact moments
    // (values pre-rounded to 4 dp and carried as DECIMAL, products
    // exact at scale 8), then t and Welch df evaluate in double from
    // bit-identical inputs on both engines. No p-value on purpose —
    // that needs a t-CDF, and a wrong-tailed lookup is worse than
    // handing t/df to the stats layer.
    // One-way ANOVA across ALL event types (ab_ttest's k-group
    // sibling): F = (SSB/(k−1))/(SSW/(N−k)) from per-group exact
    // DECIMAL moments. The cross-group reduction sums per-group
    // s²/n terms pre-rounded to 6 dp and carried as DECIMAL, so the
    // k-way double sum is ORDER-INDEPENDENT (a raw double sum over
    // groups would vary with partition merge order). No p-value, the
    // ab_ttest rule: that needs an F-CDF, the stats layer's job.
    "stats_anova" -> { (s, dir) =>
      val v = PRound.pround(col("value"), 4).cast("decimal(12,4)")
      val g = Tables.events(s, dir)
        .select(col("event_type"), v.as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          sum(col("v") * col("v")).as("svv"))
      val a = g.agg(
        count(lit(1)).as("k"),
        sum(col("n")).as("nn"),
        sum(col("sv")).cast("double").as("grand"),
        sum(col("svv")).cast("double").as("sstot"),
        sum(PRound.pround(col("sv").cast("double") * col("sv").cast("double") /
            col("n").cast("double"), 6).cast("decimal(28,6)"))
          .cast("double").as("term"))
      a.withColumn("ssb0",
          col("term") - col("grand") * col("grand") / col("nn").cast("double"))
        .withColumn("ssw0", col("sstot") - col("term"))
        .select(col("k"), col("nn").as("n"),
          PRound.pround(col("ssb0"), 4).as("ss_between"),
          PRound.pround(col("ssw0"), 4).as("ss_within"),
          PRound.pround((col("ssb0") / (col("k").cast("double") - 1)) /
            (col("ssw0") / (col("nn").cast("double") - col("k").cast("double"))),
            4).as("f_stat"),
          PRound.pround(col("ssb0") / (col("ssb0") + col("ssw0")), 6)
            .as("eta_sq"))
    },

    // Brown–Forsythe (median-centered Levene) test of variance
    // homogeneity across event types — stats_anova's PRECONDITION
    // check (ANOVA assumes equal group variances; this is the test
    // that says whether to believe it, itself robust because the
    // centers are medians): per-group exact-percentile median
    // broadcast back (the anomaly_mad shape — never a global sort),
    // deviations |x−med| pre-rounded to 4 dp into exact DECIMAL, then
    // the stats_anova moment pipeline verbatim on the deviations —
    // per-group sums exact, cross-group s²/n terms pre-rounded 6 dp
    // and summed as DECIMAL, W in double from bit-identical inputs.
    "stats_levene" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(PRound.pround(expr("percentile(value, 0.5)"), 4).as("med"))
      val z = ev.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"),
          PRound.pround(abs(col("value") - col("med")), 4)
            .cast("decimal(12,4)").as("z"))
      val g = z.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("z")).as("sz"),
          sum(col("z") * col("z")).as("szz"))
      val a = g.agg(
        count(lit(1)).as("k"),
        sum(col("n")).as("nn"),
        sum(col("sz")).cast("double").as("grand"),
        sum(col("szz")).cast("double").as("sstot"),
        sum(PRound.pround(col("sz").cast("double") * col("sz").cast("double") /
            col("n").cast("double"), 6).cast("decimal(28,6)"))
          .cast("double").as("term"))
      a.withColumn("ssb0",
          col("term") - col("grand") * col("grand") / col("nn").cast("double"))
        .withColumn("ssw0", col("sstot") - col("term"))
        .select(col("k"), col("nn").as("n"),
          PRound.pround((col("ssb0") / (col("k").cast("double") - 1)) /
            (col("ssw0") / (col("nn").cast("double") - col("k").cast("double"))),
            4).as("w_stat"))
    },

    // Mann-Whitney U (Wilcoxon rank-sum) per event type between the
    // experiment arms — the NONPARAMETRIC sibling of ab_ttest (no
    // normality assumption; the robust default when value is skewed).
    // The entire rank machinery is exact integer arithmetic: ranking
    // collapses to the (type, 4-dp value) census (tied values share
    // the average rank, carried DOUBLED so it stays a long:
    // 2·avg = 2·(prev+1) + c − 1), the doubled rank-sum of arm A is
    // Σ ca·r2 over value groups, and the tie correction Σ(t³−t) rides
    // the same census — no per-row window over the data, just an
    // ordered cumsum over the ≤|distinct values| frame. z from the
    // normal approximation with tie-corrected variance evaluates in
    // double from bit-identical longs. No p-value (the ab_ttest rule).
    "stats_mannwhitney" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val v = PRound.pround(col("value"), 4).cast("decimal(12,4)")
      val byVal = Tables.events(s, dir)
        .select(col("event_type"), (col("user_id") % 2 === 0).as("a"), v.as("v"))
        .groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("c"),
          sum(when(col("a"), 1L).otherwise(0L)).as("ca"))
      val ord = Window.partitionBy(col("event_type")).orderBy(col("v"))
      val ranked = byVal
        .withColumn("prevc", coalesce(sum(col("c")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("r2", lit(2L) * (col("prevc") + 1) + col("c") - 1)
      val ag = ranked.groupBy(col("event_type"))
        .agg(sum(col("ca")).as("na"), sum(col("c") - col("ca")).as("nb"),
          sum(col("ca") * col("r2")).as("ra2"),
          sum(col("c") * col("c") * col("c") - col("c")).as("tie"))
      val u = (col("ra2") - col("na") * (col("na") + 1)).cast("double") / 2.0
      val mu = col("na").cast("double") * col("nb").cast("double") / 2.0
      val sig2 = (col("na").cast("double") * col("nb").cast("double") / 12.0) *
        ((col("na") + col("nb") + 1).cast("double") -
          col("tie").cast("double") /
            ((col("na") + col("nb")).cast("double") *
              (col("na") + col("nb") - 1).cast("double")))
      ag.select(col("event_type"), col("na").as("n_a"), col("nb").as("n_b"),
          u.as("u"),
          when(sig2 > 0, PRound.pround((u - mu) / sqrt(sig2), 4))
            .otherwise(lit(null).cast("double")).as("z"))
        .orderBy(col("event_type"))
    },

    // Chi-squared independence test: event_type × experiment arm
    // (user_id parity) contingency table. The table is the FULL grid
    // (distinct event_types × both arms, observed counts coalesced to
    // 0 — ADVICE r10: a cell built from observed groupBy rows only
    // drops an empty cell's (0−E)²/E = E term and understates χ²; the
    // textbook statistic sums over every cell of the r×c table).
    // Observed counts are exact longs; row/col/grand totals come from
    // windows over the ≤2k-cell frame (integer sums — order-free);
    // each cell's contribution is pre-rounded to 6 dp and summed as
    // DECIMAL so the reduction is order-independent (the stats_anova
    // discipline). Cramér's V normalizes for table size. No p-value
    // (χ²-CDF = the stats layer's job, the ab_ttest rule).
    "stats_chi2" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val obs = Tables.events(s, dir)
        .select(col("event_type"), (col("user_id") % 2 === 0).as("arm"))
        .groupBy(col("event_type"), col("arm"))
        .agg(count(lit(1)).as("o"))
      val arms = s.range(2).select((col("id") === 0).as("arm"))
      val cells = obs.select(col("event_type")).distinct()
        .crossJoin(broadcast(arms))
        .join(obs, Seq("event_type", "arm"), "left")
        .select(col("event_type"), col("arm"),
          coalesce(col("o"), lit(0L)).as("o"))
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val byRow = Window.partitionBy(col("event_type")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val byCol = Window.partitionBy(col("arm")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val contrib = cells
        .withColumn("n", sum(col("o")).over(all))
        .withColumn("rt", sum(col("o")).over(byRow))
        .withColumn("ct", sum(col("o")).over(byCol))
        .withColumn("e", col("rt").cast("double") * col("ct").cast("double") /
          col("n").cast("double"))
        // e = 0 only when a whole arm (column) is empty — that cell
        // contributes nothing in the textbook statistic (its row is
        // degenerate), and 0/0 must not poison the sum with NaN
        .withColumn("c", when(col("e") > 0, PRound.pround(
          (col("o").cast("double") - col("e")) *
            (col("o").cast("double") - col("e")) / col("e"), 6))
          .otherwise(lit(0.0)))
      contrib.agg(
          count(lit(1)).as("n_cells"),
          max(col("n")).as("n"),
          (countDistinct(col("event_type")) - 1).as("dof"),
          sum(col("c").cast("decimal(28,6)")).cast("double").as("chi2_raw"))
        .select(col("n_cells"), col("n"), col("dof"),
          col("chi2_raw").as("chi2"), // DECIMAL(…,6) sum: already 6 dp
          PRound.pround(sqrt(col("chi2_raw") / col("n").cast("double")), 6)
            .as("cramers_v"))
    },

    // Association rules over co-purchased part pairs — basket_pairs'
    // consumer (support alone ranks ubiquity, not affinity): for each
    // supported pair, confidence both ways and lift against item
    // independence, top-20 by lift. Item and pair supports are the
    // SAME distinct-(order, part) frame aggregated twice — exact
    // integer counts, keyed equi-joins on the part id (at 100 TB both
    // support tables shuffle-join on their keys; nothing is
    // collected), and the podium is TakeOrderedAndProject, never a
    // global sort.
    "basket_rules" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      // basket count rides a broadcast 1-row frame — no driver action
      val nB = li.agg(countDistinct(col("ok")).cast("double").as("n_baskets"))
      val item = li.groupBy(col("pk")).agg(count(lit(1)).as("supp"))
      val a = li.select(col("ok"), col("pk").as("p1"))
      val b = li.select(col("ok"), col("pk").as("p2"))
      val pair = a.join(b, Seq("ok")).filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("supp_ab"))
        .filter(col("supp_ab") >= 2)
      pair
        .join(item.select(col("pk").as("p1"), col("supp").as("supp_a")), Seq("p1"))
        .join(item.select(col("pk").as("p2"), col("supp").as("supp_b")), Seq("p2"))
        .crossJoin(broadcast(nB))
        .select(col("p1"), col("p2"), col("supp_ab"), col("supp_a"), col("supp_b"),
          PRound.pround(col("supp_ab").cast("double") /
            col("supp_a").cast("double"), 6).as("conf_a_b"),
          PRound.pround(col("supp_ab").cast("double") /
            col("supp_b").cast("double"), 6).as("conf_b_a"),
          PRound.pround(col("supp_ab").cast("double") * col("n_baskets") /
            (col("supp_a").cast("double") * col("supp_b").cast("double")), 6)
            .as("lift"))
        .orderBy(col("lift").desc, col("p1"), col("p2"))
        .limit(20)
    },

    // Holt double-exponential smoothing (level + trend, α=β=0.5) over
    // each nation's yearly revenue — forecast_linear's adaptive
    // sibling (the regression weights all years equally; Holt tracks
    // drift). The recursion folds LEFT-TO-RIGHT over the year-sorted
    // array inside one codegen'd `aggregate` HOF — per-key state is
    // two doubles, series never leaves its group — and the oracle
    // replays the identical IEEE op sequence as a recursive CTE, so
    // results are bit-equal (0.5 multiplies are exact halvings;
    // inputs are the same 2-dp revenue doubles both engines derive
    // from exact DECIMAL sums). | 100 TB: one keyed agg; the fold is
    // O(series length) per key with no shuffle beyond the groupBy.
    "forecast_holt" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      val yearly = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_totalprice"),
          year(col("o_orderdate")).as("o_year"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(PRound.pround(sum(col("o_totalprice")), 2).as("revenue"))
      val series = yearly.groupBy(col("n_name"))
        .agg(sort_array(collect_list(struct(col("o_year"), col("revenue"))))
          .as("arr"))
        .filter(size(col("arr")) >= 2)
      val xs = transform(col("arr"), e => e.getField("revenue"))
      val init = struct(
        element_at(xs, 1).as("l"),
        (element_at(xs, 2) - element_at(xs, 1)).as("b"))
      def lNew(acc: Column, x: Column): Column =
        lit(0.5) * x + lit(0.5) * (acc.getField("l") + acc.getField("b"))
      val folded = aggregate(
        slice(xs, lit(2), size(xs) - 1), // x₂..x_T: init is (l₁=x₁, b₁=x₂−x₁)
        init,
        (acc, x) => struct(
          lNew(acc, x).as("l"),
          (lit(0.5) * (lNew(acc, x) - acc.getField("l")) +
            lit(0.5) * acc.getField("b")).as("b")))
      series.select(col("n_name"), size(col("arr")).as("n_years"),
          folded.as("h"))
        .select(col("n_name"), col("n_years").cast("long").as("n_years"),
          PRound.pround(col("h.l"), 2).as("level"),
          PRound.pround(col("h.b"), 2).as("trend"),
          PRound.pround(col("h.l") + col("h.b"), 2).as("pred_next"))
        .orderBy(col("n_name"))
    },

    // Two-proportion z-test — ab_ttest's conversion-rate sibling (the
    // other half of every A/B readout): per event type, arm by user
    // parity, "conversion" = value above 50. Inputs are exact integer
    // counts, so both engines derive pooled rate → standard error → z
    // through an identical scalar IEEE sequence — bit-equal without
    // tolerance. Degenerate pools (all or zero conversions) yield
    // NULL z, never ±Inf. | 100 TB: one keyed agg, four longs per
    // group — nothing else moves.
    "stats_proportion_z" -> { (s, dir) =>
      val m = Tables.events(s, dir)
        .select(col("event_type"), (col("user_id") % 2 === 0).as("a"),
          (col("value") > 50.0).as("conv"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("a"), 1L).otherwise(0L)).as("na"),
          sum(when(!col("a"), 1L).otherwise(0L)).as("nb"),
          sum(when(col("a") && col("conv"), 1L).otherwise(0L)).as("xa"),
          sum(when(!col("a") && col("conv"), 1L).otherwise(0L)).as("xb"))
      val pa = col("xa").cast("double") / col("na").cast("double")
      val pb = col("xb").cast("double") / col("nb").cast("double")
      val pp = (col("xa") + col("xb")).cast("double") /
        (col("na") + col("nb")).cast("double")
      val se = sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("na").cast("double") +
          lit(1.0) / col("nb").cast("double")))
      m.select(col("event_type"), col("na").as("n_a"), col("nb").as("n_b"),
          col("xa").as("conv_a"), col("xb").as("conv_b"),
          PRound.pround(pa, 6).as("rate_a"), PRound.pround(pb, 6).as("rate_b"),
          when(pp > 0 && pp < 1, PRound.pround((pa - pb) / se, 4))
            .otherwise(lit(null).cast("double")).as("z"))
        .orderBy(col("event_type"))
    },

    // Kruskal-Wallis H across ALL event types — stats_mannwhitney's
    // k-group sibling (as stats_anova is to ab_ttest, this is to the
    // U test): values rank GLOBALLY across groups, so the census is
    // per-(type, 4-dp value) and the global tie-averaged rank comes
    // from ONE RANGE-frame prefix sum over the value-ordered census
    // (peers included ⇒ cum count at v; minus the per-v total gives
    // prevc) — no join-back, doubled ranks 2·prevc + cv + 1 stay
    // exact longs. Per-group doubled rank sums accumulate in
    // DECIMAL(38,0) (c·r2 ~ 2N² passes long at scale; oracle mirrors
    // in HUGEINT); each group's R²/n term is pre-rounded to 6 dp and
    // summed as DECIMAL (the stats_anova discipline), H and the tie
    // correction evaluate in double from bit-identical inputs. The
    // only window runs over the value-grid census (range-bounded:
    // ≤10^4·|value range| cells, never data-sized). No p-value (the
    // ab_ttest rule — χ²-CDF is the stats layer's job).
    "stats_kruskal" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val v = PRound.pround(col("value"), 4).cast("decimal(12,4)")
      val cells = Tables.events(s, dir)
        .select(col("event_type"), v.as("v"))
        .groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("c"))
      val cum = Window.orderBy(col("v"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val atV = Window.partitionBy(col("v"))
      val ranked = cells
        .withColumn("cumv", sum(col("c")).over(cum))
        .withColumn("cv", sum(col("c")).over(atV))
        .withColumn("r2", lit(2L) * (col("cumv") - col("cv")) + col("cv") + 1)
      val grouped = ranked.groupBy(col("event_type"))
        .agg(sum(col("c")).as("n_g"),
          sum(col("c").cast("decimal(38,0)") * col("r2")).as("r2_g"))
      val rg = col("r2_g").cast("double") / lit(2.0)
      val terms = grouped.select(col("n_g"),
        PRound.pround(rg * rg / col("n_g").cast("double"), 6).as("term"))
      val tie = cells.groupBy(col("v")).agg(sum(col("c")).as("cv"))
        .agg(sum(col("cv").cast("decimal(38,0)") * col("cv") * col("cv")
          - col("cv")).as("tie"))
      val a = terms.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
          sum(col("term").cast("decimal(38,6)")).as("s"))
        .crossJoin(broadcast(tie))
      val nD = col("n").cast("double")
      val h0 = lit(12.0) / (nD * (nD + lit(1.0))) * col("s").cast("double") -
        lit(3.0) * (nD + lit(1.0))
      val corr = lit(1.0) - col("tie").cast("double") / (nD * nD * nD - nD)
      a.select(col("k"), col("n"), (col("k") - 1).as("dof"),
        when(corr > 0, PRound.pround(h0 / corr, 4))
          .otherwise(lit(null).cast("double")).as("h"))
    },

    // Wilson 95% score interval per (event type, arm) for the
    // conversion rate — stats_proportion_z's ESTIMATION sibling (the
    // test says "different", the interval says "by how much, with
    // what certainty"; Wilson, unlike the Wald ±1.96·SE interval,
    // never leaves [0,1] and stays honest at extreme rates). All
    // inputs are two exact longs per group; both engines derive
    // center ± half through an identical scalar IEEE sequence
    // (z² spelled 1.96·1.96 in BOTH so the fp product is the same
    // bits — a 3.8416 literal would differ in the last ulp).
    // | 100 TB: one keyed agg, two longs per group — nothing else
    // moves.
    "conv_wilson" -> { (s, dir) =>
      val zc = lit(1.96)
      val g = Tables.events(s, dir)
        .select(col("event_type"),
          when(col("user_id") % 2 === 0, "even").otherwise("odd").as("arm"),
          (col("value") > 50.0).as("conv"))
        .groupBy(col("event_type"), col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("conv"), 1L).otherwise(0L)).as("x"))
      val nD = col("n").cast("double")
      val p = col("x").cast("double") / nD
      val z2 = zc * zc
      val denom = lit(1.0) + z2 / nD
      val center = (p + z2 / (lit(2.0) * nD)) / denom
      val half = zc * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nD)) / nD) /
        denom
      g.select(col("event_type"), col("arm"), col("n"), col("x").as("conv"),
          PRound.pround(p, 6).as("rate"),
          PRound.pround(center - half, 6).as("wilson_lo"),
          PRound.pround(center + half, 6).as("wilson_hi"))
        .orderBy(col("event_type"), col("arm"))
    },

    // Spearman rank correlation over the bounded-cardinality lineitem
    // measures (quantity 50 distinct, discount 11, tax 9) — the
    // monotone sibling of corr_matrix's Pearson. The 100 TB shape is
    // the stats_mannwhitney rank census, generalized to PAIRS: one
    // scan builds the ≤50·11·9-cell JOINT census (cut before fan-out
    // — three pair legs re-aggregate it), marginal average-ties ranks
    // come from prefix sums over the tiny per-axis censuses (2r =
    // 2·prevc + c + 1 keeps them integer), and each pair's rho is
    // Pearson-on-ranks computed EXACTLY in DECIMAL(38,0) (products
    // reach ~1e23 — past long, inside decimal38) with the single
    // double cast at the final sqrt/divide, so both engines emit
    // bit-equal rho from identical integers. Never a data-sized sort:
    // the only windows run over ≤50-row censuses.
    "corr_spearman" -> { (s, dir) =>
      import graft.operators.Materialize
      val joint = Materialize.cut(Tables.lineitem(s, dir)
        .select(col("l_quantity").as("x"), col("l_discount").as("y"),
          col("l_tax").as("t"))
        .groupBy(col("x"), col("y"), col("t")).agg(count(lit(1)).as("c")))
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      def rho(cenIn: DataFrame, label: String): DataFrame = {
        val cen = cenIn.toDF("u", "v", "c")
        def ranks(axis: String, out: String): DataFrame = {
          // prefix sum over the ≤50-row marginal census: bounded frame
          val w = Window.orderBy(col(axis))
            .rowsBetween(Window.unboundedPreceding, -1)
          cen.groupBy(col(axis)).agg(sum(col("c")).as("cm"))
            .select(col(axis),
              (lit(2L) * coalesce(sum(col("cm")).over(w), lit(0L)) +
                col("cm") + lit(1L)).as(out))
        }
        val j = cen
          .join(broadcast(ranks("u", "ru2")), Seq("u"))
          .join(broadcast(ranks("v", "rv2")), Seq("v"))
        val ag = j.agg(sum(dec(col("c"))).as("n"),
          sum(dec(col("c")) * dec(col("ru2"))).as("sx"),
          sum(dec(col("c")) * dec(col("rv2"))).as("sy"),
          sum(dec(col("c")) * dec(col("ru2")) * dec(col("ru2"))).as("sxx"),
          sum(dec(col("c")) * dec(col("rv2")) * dec(col("rv2"))).as("syy"),
          sum(dec(col("c")) * dec(col("ru2")) * dec(col("rv2"))).as("sxy"))
        ag.select(lit(label).as("pair"), col("n").cast("long").as("n"),
          PRound.pround(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double"))), 6).as("rho"))
      }
      def pairCensus(a: String, b: String): DataFrame =
        joint.groupBy(col(a), col(b)).agg(sum(col("c")).as("c"))
      rho(pairCensus("x", "y"), "quantity_discount")
        .unionByName(rho(pairCensus("x", "t"), "quantity_tax"))
        .unionByName(rho(pairCensus("y", "t"), "discount_tax"))
        .orderBy(col("pair"))
    },

    // Kendall's tau-b over the same bounded lineitem measure pairs —
    // corr_spearman's CONCORDANCE sibling (Spearman ranks, Kendall
    // counts pair inversions; tau-b is the tie-corrected form). The
    // naive statistic is O(n²) over DATA pairs — the 100 TB shape
    // collapses it to a CENSUS self-join: concordant/discordant mass
    // between two cells is just c_i·c_j, so the ≤550-cell joint
    // census (cut once, shared with the marginals) broadcast-joined
    // to itself under u_i<u_j covers every data pair exactly once.
    // Everything stays exact DECIMAL(38,0)/HUGEINT — products reach
    // ~1e24 at corpus scale — with DOUBLED tie terms (t(t−1), n(n−1))
    // so no integer ever divides by 2; the single double cast is the
    // final sqrt/divide. All-ties degenerate legs → NULL tau.
    "corr_kendall" -> { (s, dir) =>
      import graft.operators.Materialize
      val joint = Materialize.cut(Tables.lineitem(s, dir)
        .select(col("l_quantity").as("x"), col("l_discount").as("y"),
          col("l_tax").as("t"))
        .groupBy(col("x"), col("y"), col("t")).agg(count(lit(1)).as("c")))
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      def tau(cenIn: DataFrame, label: String): DataFrame = {
        val cen = cenIn.toDF("u", "v", "c")
        val a = cen.select(col("u").as("ua"), col("v").as("va"),
          col("c").as("ca"))
        val b = cen.select(col("u").as("ub"), col("v").as("vb"),
          col("c").as("cb"))
        val cd = a.join(broadcast(b), col("ua") < col("ub"))
          .agg(
            coalesce(sum(when(col("va") < col("vb"),
              dec(col("ca")) * dec(col("cb")))), lit(0).cast("decimal(38,0)"))
              .as("cc"),
            coalesce(sum(when(col("va") > col("vb"),
              dec(col("ca")) * dec(col("cb")))), lit(0).cast("decimal(38,0)"))
              .as("dd"))
        def tiesDoubled(axis: String, out: String): DataFrame =
          cen.groupBy(col(axis)).agg(sum(col("c")).as("tm"))
            .agg(sum(dec(col("tm")) * (dec(col("tm")) - 1)).as(out),
              sum(dec(col("tm"))).as(s"n_$out"))
        val ties = tiesDoubled("u", "t1").crossJoin(
          broadcast(tiesDoubled("v", "t2")))
        val allD = cd.crossJoin(broadcast(ties))
          .withColumn("n0", dec(col("n_t1")) * (dec(col("n_t1")) - 1))
        val den = sqrt((col("n0") - col("t1")).cast("double")) *
          sqrt((col("n0") - col("t2")).cast("double"))
        allD.select(lit(label).as("pair"),
          col("n_t1").cast("long").as("n"),
          when(den > 0, PRound.pround(
            (lit(2) * (col("cc") - col("dd"))).cast("double") / den, 6))
            .otherwise(lit(null).cast("double")).as("tau"))
      }
      def pairCensus(a: String, b: String): DataFrame =
        joint.groupBy(col(a), col(b)).agg(sum(col("c")).as("c"))
      tau(pairCensus("x", "y"), "quantity_discount")
        .unionByName(tau(pairCensus("x", "t"), "quantity_tax"))
        .unionByName(tau(pairCensus("y", "t"), "discount_tax"))
        .orderBy(col("pair"))
    },

    // Item-item cosine similarity from basket co-occurrence — the
    // classic co-purchase recommender build (basket_pairs' scoring
    // stage): cos(i,j) = c_ij / √(c_i·c_j) over per-order distinct
    // part sets, top-5 neighbors per item. Pair expansion rides the
    // order-keyed self-join (bounded by basket size, never
    // item×item); the distinct'd basket frame is cut once and feeds
    // both the pair join and the item counts; the podium is the
    // custom TopKPerKey partial→final plan (at most k rows per
    // (partition × item) cross the wire — no data-sized window sort).
    // Raw cosines come from identical integer counts via one
    // division, so both engines rank identically; rounding happens
    // after selection.
    "item_cosine" -> { (s, dir) =>
      import graft.operators.Materialize
      val li = Materialize.cut(Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct())
      val itemc = li.groupBy(col("pk")).agg(count(lit(1)).as("ci"))
      val pairs = li.select(col("ok"), col("pk").as("p1"))
        .join(li.select(col("ok"), col("pk").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("cij"))
        .filter(col("cij") >= 2)
      val sym = pairs.unionByName(
        pairs.select(col("p2").as("p1"), col("p1").as("p2"), col("cij")))
      val scored = sym
        .join(itemc.select(col("pk").as("p1"), col("ci").as("c1")), Seq("p1"))
        .join(itemc.select(col("pk").as("p2"), col("ci").as("c2")), Seq("p2"))
        .select(col("p1"), col("p2"), col("cij"),
          (col("cij").cast("double") /
            sqrt((col("c1") * col("c2")).cast("double"))).as("cos_raw"))
      graft.operators.TopK.perKey(scored, Seq("p1"), "cos_raw", "p2", 5)
        .select(col("p1").as("item"), col("p2").as("neighbor"),
          col("cij").as("cooc"), PRound.pround(col("cos_raw"), 6).as("cosine"))
        .orderBy(col("item"), col("cosine").desc, col("neighbor"))
    },

    "ab_ttest" -> { (s, dir) =>
      val v = PRound.pround(col("value"), 4).cast("decimal(12,4)")
      val isA = col("user_id") % 2 === 0
      def cnt(c: Column) = sum(c.cast("long"))
      def csum(c: Column, x: Column) = sum(when(c, x))
      val m = Tables.events(s, dir)
        .select(col("event_type"), isA.as("a"), v.as("v"))
        .groupBy(col("event_type"))
        .agg(cnt(col("a")).cast("double").as("na"),
          cnt(!col("a")).cast("double").as("nb"),
          csum(col("a"), col("v")).cast("double").as("sa"),
          csum(!col("a"), col("v")).cast("double").as("sb"),
          csum(col("a"), col("v") * col("v")).cast("double").as("saa"),
          csum(!col("a"), col("v") * col("v")).cast("double").as("sbb"))
      val va = (col("na") * col("saa") - col("sa") * col("sa")) /
        (col("na") * (col("na") - 1))
      val vb = (col("nb") * col("sbb") - col("sb") * col("sb")) /
        (col("nb") * (col("nb") - 1))
      val sea = va / col("na")
      val seb = vb / col("nb")
      m.select(col("event_type"),
          col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          PRound.pround(col("sa") / col("na"), 4).as("mean_a"),
          PRound.pround(col("sb") / col("nb"), 4).as("mean_b"),
          PRound.pround((col("sa") / col("na") - col("sb") / col("nb")) /
            sqrt(sea + seb), 4).as("t_stat"),
          PRound.pround((sea + seb) * (sea + seb) /
            (sea * sea / (col("na") - 1) + seb * seb / (col("nb") - 1)), 2)
            .as("welch_df"))
        .orderBy(col("event_type"))
    },

    // Cohen's d + Hedges' g effect size per event type — ab_ttest's
    // MAGNITUDE sibling (the t-stat says "real", the effect size says
    // "big enough to care"; at production sample sizes everything is
    // significant, so d is what the readout decision actually uses).
    // Same exact-moment pipeline as ab_ttest (4-dp DECIMAL values,
    // exact sums, one keyed agg); pooled sd and the small-sample g
    // correction evaluate in double through an identical scalar
    // sequence. Degenerate pools (either arm < 2) → NULL.
    "ab_cohens_d" -> { (s, dir) =>
      val v = PRound.pround(col("value"), 4).cast("decimal(12,4)")
      val isA = col("user_id") % 2 === 0
      def cnt(c: Column) = sum(c.cast("long"))
      def csum(c: Column, x: Column) = sum(when(c, x))
      val m = Tables.events(s, dir)
        .select(col("event_type"), isA.as("a"), v.as("v"))
        .groupBy(col("event_type"))
        .agg(cnt(col("a")).cast("double").as("na"),
          cnt(!col("a")).cast("double").as("nb"),
          csum(col("a"), col("v")).cast("double").as("sa"),
          csum(!col("a"), col("v")).cast("double").as("sb"),
          csum(col("a"), col("v") * col("v")).cast("double").as("saa"),
          csum(!col("a"), col("v") * col("v")).cast("double").as("sbb"))
      val va = (col("na") * col("saa") - col("sa") * col("sa")) /
        (col("na") * (col("na") - 1))
      val vb = (col("nb") * col("sbb") - col("sb") * col("sb")) /
        (col("nb") * (col("nb") - 1))
      val pooled = sqrt(((col("na") - 1) * va + (col("nb") - 1) * vb) /
        (col("na") + col("nb") - 2))
      val d = (col("sa") / col("na") - col("sb") / col("nb")) / pooled
      val g = d * (lit(1.0) - lit(3.0) /
        (lit(4.0) * (col("na") + col("nb")) - lit(9.0)))
      m.select(col("event_type"),
          col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          when(col("na") > 1 && col("nb") > 1 && pooled > 0,
            PRound.pround(d, 4)).otherwise(lit(null).cast("double"))
            .as("cohens_d"),
          when(col("na") > 1 && col("nb") > 1 && pooled > 0,
            PRound.pround(g, 4)).otherwise(lit(null).cast("double"))
            .as("hedges_g"))
        .orderBy(col("event_type"))
    },

    // Sample-ratio-mismatch check per event type — the A/B HEALTH
    // gate that runs before any readout is trusted (a 50/50 split
    // that isn't 50/50 means broken assignment, and every downstream
    // stat is garbage): χ² vs the even split from two exact longs,
    // flag at the 1-dof 95% line. One keyed agg, join- and
    // window-free.
    "ab_srm" -> { (s, dir) =>
      val m = Tables.events(s, dir)
        .select(col("event_type"), (col("user_id") % 2 === 0).as("a"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("a"), 1L).otherwise(0L)).as("na"),
          sum(when(!col("a"), 1L).otherwise(0L)).as("nb"))
      val e = (col("na") + col("nb")).cast("double") / lit(2.0)
      val chi2 = (col("na").cast("double") - e) * (col("na").cast("double") - e) / e +
        (col("nb").cast("double") - e) * (col("nb").cast("double") - e) / e
      m.select(col("event_type"), col("na").as("n_a"), col("nb").as("n_b"),
          PRound.pround(chi2, 6).as("chi2"),
          (chi2 > 3.841).as("srm_flag"))
        .orderBy(col("event_type"))
    })

  private val profileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_orderpriority", "o_orderdate")

  private val profileOracleSql: String = {
    val cols = profileCols
    val wide = cols.map { c =>
      s"""    CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c,
         |    CAST(count(DISTINCT $c) AS BIGINT) AS nd_$c,
         |    CAST(min($c) AS VARCHAR) AS mn_$c,
         |    CAST(max($c) AS VARCHAR) AS mx_$c""".stripMargin
    }.mkString(",\n")
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val as = if (i == 0)
        " AS column_name, nn_" + c + " AS n_nulls, nd_" + c +
          " AS n_distinct, mn_" + c + " AS min_value, mx_" + c + " AS max_value"
      else s", nn_$c, nd_$c, mn_$c, mx_$c"
      s"  SELECT '$c'$as FROM w"
    }.mkString("\n  UNION ALL\n")
    s"""WITH w AS (
       |  SELECT
       |$wide
       |  FROM orders)
       |SELECT * FROM (
       |$rows)
       |ORDER BY column_name""".stripMargin
  }

  /** Replays HllEst per column: md5 nibble arithmetic → 64 registers →
    * harmonic sum → linear-counting correction, then the same stack as
    * the exact profile. One CTE chain per column — verbose, but every
    * step is the aggregate's own math. */
  private val profileApproxOracleSql: String = {
    val cols = profileCols
    val rankCases = (0 until 20).map(i =>
      s"WHEN x >= ${1L << (19 - i)} THEN ${i + 1}").mkString(" ")
    val estCtes = cols.map { c =>
      s"""est_$c AS (
         |  SELECT CASE WHEN raw <= 2.5 * 64 AND empty > 0
         |              THEN round(64 * ln(64.0 / empty), 2)
         |              ELSE round(raw, 2) END AS nd
         |  FROM (
         |    SELECT 0.709 * 64 * 64 / (s + (64 - used)) AS raw,
         |      64 - used AS empty
         |    FROM (
         |      SELECT count(*) AS used, sum(power(2.0, -reg)) AS s
         |      FROM (
         |        SELECT b, max(r) AS reg FROM (
         |          SELECT (${Scale.hexN("h", 1, 2)}) % 64 AS b,
         |            CASE $rankCases ELSE 21 END AS r
         |          FROM (
         |            SELECT h, (${Scale.hexN("h", 3, 5)}) AS x FROM (
         |              SELECT md5(CAST($c AS VARCHAR)) AS h FROM orders
         |              WHERE $c IS NOT NULL)))
         |        GROUP BY b))))""".stripMargin
    }.mkString(",\n")
    val wide = cols.map { c =>
      s"""    CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c,
         |    CAST(min($c) AS VARCHAR) AS mn_$c,
         |    CAST(max($c) AS VARCHAR) AS mx_$c""".stripMargin
    }.mkString(",\n")
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val as = if (i == 0)
        " AS column_name, nn_" + c + " AS n_nulls, (SELECT nd FROM est_" + c +
          ") AS n_distinct_est, mn_" + c + " AS min_value, mx_" + c + " AS max_value"
      else s", nn_$c, (SELECT nd FROM est_$c), mn_$c, mx_$c"
      s"  SELECT '$c'$as FROM w"
    }.mkString("\n  UNION ALL\n")
    s"""WITH
       |$estCtes,
       |w AS (
       |  SELECT
       |$wide
       |  FROM orders)
       |SELECT * FROM (
       |$rows)
       |ORDER BY column_name""".stripMargin
  }

  /** Per-group HLL replay for one column: CTE chain ending in
    * `est$n(g, nd)` keyed by the group. */
  private def hllGroupCte(n: Int, groupCol: String, valueCol: String): String = {
    val rankCases = (0 until 20).map(i =>
      s"WHEN x >= ${1L << (19 - i)} THEN ${i + 1}").mkString(" ")
    s"""br$n AS (
       |  SELECT g, (${Scale.hexN("h", 1, 2)}) % 64 AS b,
       |    CASE $rankCases ELSE 21 END AS r
       |  FROM (
       |    SELECT g, h, (${Scale.hexN("h", 3, 5)}) AS x FROM (
       |      SELECT $groupCol AS g, md5(CAST($valueCol AS VARCHAR)) AS h
       |      FROM orders WHERE $valueCol IS NOT NULL))),
       |reg$n AS (SELECT g, b, max(r) AS reg FROM br$n GROUP BY 1, 2),
       |est$n AS (
       |  SELECT g, CASE WHEN raw <= 2.5 * 64 AND empty > 0
       |              THEN round(64 * ln(64.0 / empty), 2)
       |              ELSE round(raw, 2) END AS nd
       |  FROM (
       |    SELECT g, 0.709 * 64 * 64 / (s + (64 - used)) AS raw,
       |      64 - used AS empty
       |    FROM (
       |      SELECT g, count(*) AS used, sum(power(2.0, -reg)) AS s
       |      FROM reg$n GROUP BY g)))""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "table_profile" -> profileOracleSql,
    "table_profile_approx" -> profileApproxOracleSql,

    "profile_grouped" ->
      s"""WITH
         |${hllGroupCte(1, "o_orderpriority", "o_custkey")},
         |${hllGroupCte(2, "o_orderpriority", "o_orderdate")},
         |base AS (
         |  SELECT o_orderpriority AS g, count(*) AS n_rows,
         |    round(min(o_totalprice), 2) AS min_price,
         |    round(max(o_totalprice), 2) AS max_price
         |  FROM orders GROUP BY 1)
         |SELECT b.g AS o_orderpriority, b.n_rows,
         |  e1.nd AS nd_custkey_est, e2.nd AS nd_orderdate_est,
         |  b.min_price, b.max_price
         |FROM base b
         |JOIN est1 e1 ON e1.g = b.g
         |JOIN est2 e2 ON e2.g = b.g
         |ORDER BY o_orderpriority""".stripMargin,

    "moving_avg_range" ->
      """WITH daily AS (
        |  SELECT date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day,
        |    sum(o_totalprice) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT day, round(rev, 2) AS rev,
        |  round(avg(rev) OVER (ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS avg_7d
        |FROM daily ORDER BY day""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_yearly" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY n_name, o_year""".stripMargin,

    "yoy_growth" ->
      """WITH yearly AS (
        |  SELECT year(o_orderdate) AS o_year, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT o_year, round(rev, 2) AS revenue,
        |  round((rev - lag(rev) OVER (ORDER BY o_year))
        |        / lag(rev) OVER (ORDER BY o_year) * 100, 4) AS growth_pct
        |FROM yearly ORDER BY o_year""".stripMargin,

    "topk_per_group" ->
      """WITH rev AS (
        |  SELECT o_custkey, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT c_mktsegment, c_custkey, c_name, rev,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY rev DESC, c_custkey) AS rk
        |  FROM customer JOIN rev ON c_custkey = o_custkey)
        |SELECT c_mktsegment, rk, c_custkey, c_name,
        |  round(rev, 2) AS revenue
        |FROM ranked WHERE rk <= 3
        |ORDER BY c_mktsegment, rk""".stripMargin,

    "supplier_topk" ->
      """WITH per_supp AS (
        |  SELECT n_name, s_suppkey,
        |    sum(l_extendedprice * (1 - l_discount)) AS rev
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name, s_suppkey),
        |ranked AS (
        |  SELECT n_name, s_suppkey, rev,
        |    row_number() OVER (PARTITION BY n_name
        |                       ORDER BY rev DESC, s_suppkey) AS rk
        |  FROM per_supp)
        |SELECT n_name, s_suppkey, round(rev, 2) AS revenue
        |FROM ranked WHERE rk <= 3
        |ORDER BY n_name, revenue DESC, s_suppkey""".stripMargin,

    "join_star" ->
      """SELECT r_name, year(o_orderdate) AS o_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, year(o_orderdate)
        |ORDER BY r_name, o_year""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(round(l_extendedprice / l_quantity, 4)) AS unit_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |ranked AS (
        |  SELECT p_name, l_suppkey, unit_cost,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY unit_cost, l_suppkey) AS rk
        |  FROM cost JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 10 AND p_type = 'STANDARD')
        |SELECT p_name, s_name, unit_cost
        |FROM ranked JOIN supplier ON s_suppkey = l_suppkey
        |WHERE rk = 1
        |ORDER BY unit_cost, p_name LIMIT 20""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n2.n_name = 'NATION_12' AND n1.n_name = 'NATION_10')
        |    OR (n2.n_name = 'NATION_10' AND n1.n_name = 'NATION_12'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH j AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    sn.n_name AS supp_nation,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS net
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA')
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN net
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 2)
        |    AS nation_revenue,
        |  round(CAST(sum(net) AS DOUBLE), 2) AS total_revenue,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN net
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(net) AS DOUBLE), 6) AS mkt_share
        |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  round(CAST(sum(CAST(l_extendedprice * (0.5 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q11_important_stock" ->
      """WITH nat AS (
        |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'),
        |per_part AS (
        |  SELECT l_partkey, CAST(sum(v) AS DECIMAL(28,2)) AS value_dec
        |  FROM nat GROUP BY l_partkey),
        |total AS (
        |  SELECT CAST(sum(value_dec) AS DECIMAL(38,2)) AS t FROM per_part)
        |SELECT l_partkey AS p_partkey,
        |  round(CAST(value_dec AS DOUBLE), 2) AS value
        |FROM per_part, total
        |WHERE CAST(value_dec AS DOUBLE) > CAST(t AS DOUBLE) * 0.002
        |ORDER BY value DESC, p_partkey""".stripMargin,

    "q13_order_distribution" ->
      """WITH counts AS (
        |  SELECT c_custkey, count(o_custkey) AS c_count
        |  FROM customer LEFT JOIN (
        |    SELECT o_custkey FROM orders
        |    WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM counts GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q17_small_quantity" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#11' AND p_size = 5),
        |avgq AS (
        |  SELECT l_partkey AS pk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*) AS avg_qty
        |  FROM li GROUP BY l_partkey)
        |SELECT round(CAST(sum(price) AS DOUBLE) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM li JOIN avgq ON l_partkey = pk
        |WHERE l_quantity < avg_qty * 0.2""".stripMargin,

    "q20_excess_stock" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |    year(l_shipdate) = 1996 AS in96
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO'),
        |ps AS (
        |  SELECT DISTINCT l_suppkey FROM (
        |    SELECT l_partkey, l_suppkey,
        |      CAST(sum(CASE WHEN in96 THEN qty
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty96,
        |      CAST(sum(qty) AS DOUBLE) AS qty_all
        |    FROM li GROUP BY l_partkey, l_suppkey)
        |  WHERE qty96 > qty_all * 0.3)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_8'
        |  AND s_suppkey IN (SELECT l_suppkey FROM ps)
        |ORDER BY s_suppkey""".stripMargin,

    "q12_shipmode" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag IN ('A', 'R')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q14_promo" ->
      """WITH j AS (
        |  SELECT p_type,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS net
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'),
        |sums AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN net
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(28,4))
        |      AS promo_revenue,
        |    CAST(sum(net) AS DECIMAL(28,4)) AS total_revenue
        |  FROM j)
        |SELECT promo_revenue, total_revenue,
        |  round(100.0 * CAST(promo_revenue AS DOUBLE)
        |    / CAST(total_revenue AS DOUBLE), 4) AS promo_share_pct
        |FROM sums""".stripMargin,

    "q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q21_suppliers_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM (SELECT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
        |      WHERE l_returnflag = 'R') f
        |JOIN supplier ON s_suppkey = sk
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = ok AND l2.l_suppkey <> sk)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = ok AND l3.l_suppkey <> sk
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q22_global_sales" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer),
        |avg_bal AS (
        |  SELECT CAST(sum(bal) AS DOUBLE) / count(*) AS avg_bal
        |  FROM c WHERE bal > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  count(*) AS numcust,
        |  round(CAST(sum(bal) AS DOUBLE), 2) AS totacctbal
        |FROM c, avg_bal
        |WHERE CAST(bal AS DOUBLE) > avg_bal
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q16_parts_supplier" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |  WHERE l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0))
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "pareto_front" ->
      """WITH cust AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*), 2) AS avg_order
        |  FROM orders GROUP BY 1),
        |perx AS (
        |  SELECT n_orders, max(avg_order) AS ymax FROM cust GROUP BY 1),
        |sw AS (
        |  SELECT n_orders, ymax,
        |    max(ymax) OVER (ORDER BY n_orders DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_strict
        |  FROM perx)
        |SELECT n_orders, ymax AS max_avg_order
        |FROM sw WHERE t_strict IS NULL OR ymax > t_strict
        |ORDER BY n_orders""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-10-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c_name, o_orderkey, o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "integrity_check" ->
      """SELECT
        |  (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
        |    AS orphan_lineitems,
        |  (SELECT count(*) FROM orders o LEFT JOIN customer c
        |     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
        |    AS orphan_orders,
        |  (SELECT count(*) FROM customer c LEFT JOIN nation n
        |     ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
        |    AS orphan_customers,
        |  (SELECT count(*) FROM (SELECT o_orderkey FROM orders
        |     GROUP BY o_orderkey HAVING count(*) > 1)) AS dup_orderkeys,
        |  (SELECT count(*) FROM (SELECT c_custkey FROM customer
        |     GROUP BY c_custkey HAVING count(*) > 1)) AS dup_custkeys""".stripMargin,

    "basket_pairs" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS p1, b.pk AS p2, count(*) AS support
        |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY p1, p2""".stripMargin,

    "orders_rfm" ->
      """WITH rfm AS (
        |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last,
        |    count(*) AS freq, round(sum(o_totalprice), 2) AS mon
        |  FROM orders GROUP BY o_custkey),
        |mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
        |scored AS (
        |  SELECT o_custkey, date_diff('day', last, mx.mx) AS rec, freq, mon
        |  FROM rfm, mx),
        |cuts AS (
        |  SELECT round(quantile_cont(rec, 0.5), 4) AS rc,
        |    round(quantile_cont(freq, 0.5), 4) AS fc,
        |    round(quantile_cont(mon, 0.5), 4) AS mc
        |  FROM scored)
        |SELECT 'r' || CAST(rec <= rc AS INT) || 'f' || CAST(freq >= fc AS INT)
        |    || 'm' || CAST(mon >= mc AS INT) AS segment,
        |  count(*) AS n_customers
        |FROM scored, cuts GROUP BY 1 ORDER BY segment""".stripMargin,

    "set_ops" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin,

    "cube_multi" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,

    "ntile_quartiles" ->
      """WITH q AS (
        |  SELECT c_mktsegment, c_acctbal,
        |    ntile(4) OVER (PARTITION BY c_mktsegment
        |                   ORDER BY c_acctbal, c_custkey) AS quartile
        |  FROM customer)
        |SELECT c_mktsegment, quartile, count(*) AS n,
        |  round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
        |FROM q GROUP BY c_mktsegment, quartile
        |ORDER BY c_mktsegment, quartile""".stripMargin,

    "rollup_multi" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        |  coalesce(n_name, 'ALL') AS nation,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "running_total" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT d, round(rev, 2) AS revenue,
        |  round(sum(rev) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_revenue
        |FROM daily ORDER BY d""".stripMargin,

    "abc_parts" ->
      """WITH rev AS (
        |  SELECT l_partkey AS pk,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4)
        |      AS DECIMAL(18,4))) AS rev
        |  FROM lineitem GROUP BY l_partkey),
        |tot AS (SELECT sum(rev) AS tot FROM rev),
        |cum AS (
        |  SELECT pk, rev,
        |    sum(rev) OVER (ORDER BY rev DESC, pk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM rev),
        |sh AS (
        |  SELECT pk, rev,
        |    CAST(cum AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS share
        |  FROM cum, tot)
        |SELECT pk, CAST(rev AS DOUBLE) AS revenue, round(share, 6)
        |    AS cum_share,
        |  CASE WHEN share <= 0.7 THEN 'A'
        |       WHEN share <= 0.9 THEN 'B' ELSE 'C' END AS abc
        |FROM sh ORDER BY pk""".stripMargin,

    "above_avg" ->
      """WITH w AS (
        |  SELECT o_custkey, o_totalprice,
        |    avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
        |  FROM orders)
        |SELECT o_custkey, count(*) AS n_above,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM w WHERE o_totalprice > cust_avg
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "group_concat" ->
      """SELECT c_mktsegment,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names,
        |  count(*) AS n
        |FROM customer WHERE c_acctbal > 9000
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "moving_avg" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT d, round(rev, 2) AS revenue,
        |  round(avg(rev) OVER (ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
        |FROM daily ORDER BY d""".stripMargin,

    "exact_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "window_funcs" ->
      """WITH y AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT yr, n_orders,
        |  round(percent_rank() OVER (ORDER BY n_orders, yr), 4) AS pct_rank,
        |  round(cume_dist() OVER (ORDER BY n_orders, yr), 4) AS cume,
        |  lead(n_orders, 1) OVER (ORDER BY yr) AS next_n
        |FROM y ORDER BY yr""".stripMargin,

    "grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,

    "percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 4) AS p25,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.75), 4) AS p75,
        |  round(min(value), 2) AS vmin,
        |  round(max(value), 2) AS vmax
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "entropy_profile" -> {
      def leg(c: String) =
        s"""  SELECT '$c' AS column_name, nd AS n_distinct,
           |    round(eb, 6) AS entropy_bits, round(ts, 6) AS top_share
           |  FROM (
           |    SELECT CAST(count(*) AS BIGINT) AS nd,
           |      -sum((cnt / total) * log2(cnt / total)) AS eb,
           |      max(cnt) / max(total) AS ts
           |    FROM (
           |      SELECT CAST(cnt AS DOUBLE) AS cnt,
           |        CAST(sum(cnt) OVER () AS DOUBLE) AS total
           |      FROM (SELECT count(*) AS cnt FROM orders GROUP BY $c)))""".stripMargin
      s"""SELECT * FROM (
         |${leg("o_orderstatus")}
         |  UNION ALL
         |${leg("o_orderpriority")})
         |ORDER BY column_name""".stripMargin
    },

    // serve ≡ build: the stored variant shares winsorize's oracle
    "winsorize_stored" ->
      """WITH cuts AS (
        |  SELECT event_type,
        |    round(quantile_cont(value, 0.05), 4) AS lo,
        |    round(quantile_cont(value, 0.95), 4) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n,
        |  round(CAST(sum(CAST(round(
        |      least(greatest(e.value, c.lo), c.hi), 4)
        |    AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_winsorized,
        |  CAST(sum(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(sum(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi,
        |  max(c.lo) AS lo, max(c.hi) AS hi
        |FROM events e JOIN cuts c ON c.event_type = e.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "winsorize" ->
      """WITH cuts AS (
        |  SELECT event_type,
        |    round(quantile_cont(value, 0.05), 4) AS lo,
        |    round(quantile_cont(value, 0.95), 4) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n,
        |  round(CAST(sum(CAST(round(
        |      least(greatest(e.value, c.lo), c.hi), 4)
        |    AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_winsorized,
        |  CAST(sum(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(sum(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi,
        |  max(c.lo) AS lo, max(c.hi) AS hi
        |FROM events e JOIN cuts c ON c.event_type = e.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "corr_matrix" -> {
      def corr(sxy: String, sx: String, sy: String, sxx: String, syy: String) =
        s"""round((n * $sxy - $sx * $sy) /
           |    (sqrt(n * $sxx - $sx * $sx) * sqrt(n * $syy - $sy * $sy)), 4)""".stripMargin
      s"""WITH m AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS q,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
         |    CAST(round(l_discount * 100) AS BIGINT) AS dc
         |  FROM lineitem),
         |w AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(p) AS DOUBLE) AS sp,
         |    CAST(sum(dc) AS DOUBLE) AS sd,
         |    CAST(sum(q * q) AS DOUBLE) AS sqq,
         |    CAST(sum(p * p) AS DOUBLE) AS spp,
         |    CAST(sum(dc * dc) AS DOUBLE) AS sdd,
         |    CAST(sum(q * p) AS DOUBLE) AS sqp,
         |    CAST(sum(q * dc) AS DOUBLE) AS sqd,
         |    CAST(sum(p * dc) AS DOUBLE) AS spd
         |  FROM m)
         |SELECT * FROM (
         |  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
         |    ${corr("sqp", "sq", "sp", "sqq", "spp")} AS corr FROM w
         |  UNION ALL
         |  SELECT 'l_quantity', 'l_discount',
         |    ${corr("sqd", "sq", "sd", "sqq", "sdd")} FROM w
         |  UNION ALL
         |  SELECT 'l_extendedprice', 'l_discount',
         |    ${corr("spd", "sp", "sd", "spp", "sdd")} FROM w)
         |ORDER BY col_x, col_y""".stripMargin
    },

    "category_collapse" ->
      """WITH counts AS (
        |  SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand),
        |total AS (SELECT sum(cnt) AS total FROM counts)
        |SELECT CASE WHEN cnt < total * 0.04 THEN 'OTHER'
        |            ELSE p_brand END AS category,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_merged
        |FROM counts CROSS JOIN total
        |GROUP BY 1 ORDER BY category""".stripMargin,

    "benford_audit" ->
      """WITH counts AS (
        |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INT) AS d,
        |    count(*) AS n_obs
        |  FROM orders WHERE o_totalprice > 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_obs) AS DOUBLE) AS total FROM counts),
        |per AS (
        |  SELECT d, n_obs,
        |    round(n_obs / total, 4) AS p_obs,
        |    round(log10(1 + 1.0 / d), 4) AS p_benford,
        |    round((n_obs - total * log10(1 + 1.0 / d))
        |        * (n_obs - total * log10(1 + 1.0 / d))
        |        / (total * log10(1 + 1.0 / d)), 4) AS chi2_contrib
        |  FROM counts CROSS JOIN tot),
        |chi AS (
        |  SELECT round(list_aggregate(list_transform(
        |      list_sort(list({'d': d, 'c': chi2_contrib})),
        |      x -> x.c), 'sum'), 3) AS chi2
        |  FROM per)
        |SELECT p.d, p.n_obs, p.p_obs, p.p_benford, p.chi2_contrib, c.chi2
        |FROM per p CROSS JOIN chi c ORDER BY p.d""".stripMargin,

    "forecast_linear" ->
      """WITH yearly AS (
        |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |    round(sum(o_totalprice), 2) AS revenue
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT n_name, count(*) AS n_years,
        |    CAST(sum(CAST(o_year AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(o_year AS BIGINT) * o_year) AS BIGINT) AS sxx,
        |    CAST(sum(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(revenue AS DECIMAL(18,2)) * o_year) AS DOUBLE)
        |      AS sxy,
        |    max(o_year) AS last_year
        |  FROM yearly GROUP BY 1 HAVING count(*) >= 2),
        |sl AS (
        |  SELECT *, (n_years * sxy - sx * sy)
        |      / (n_years * sxx - sx * sx) AS slope
        |  FROM s),
        |ic AS (SELECT *, (sy - slope * sx) / n_years AS icept FROM sl)
        |SELECT n_name, n_years, round(slope, 4) AS slope,
        |  round(icept, 2) AS intercept,
        |  round(slope * (last_year + 1) + icept, 2) AS pred_next
        |FROM ic ORDER BY n_name""".stripMargin,

    "stats_mannwhitney" ->
      """WITH m AS (
        |  SELECT event_type, user_id % 2 = 0 AS a,
        |    CAST(round(value, 4) AS DECIMAL(12,4)) AS v
        |  FROM events),
        |byval AS (
        |  SELECT event_type, v, count(*) AS c,
        |    sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca
        |  FROM m GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, v, c, ca,
        |    coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevc
        |  FROM byval),
        |r2 AS (
        |  SELECT event_type, c, ca, 2 * (prevc + 1) + c - 1 AS r2 FROM rk),
        |ag AS (
        |  SELECT event_type,
        |    CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(c - ca) AS BIGINT) AS nb,
        |    CAST(sum(ca * r2) AS BIGINT) AS ra2,
        |    CAST(sum(c * c * c - c) AS BIGINT) AS tie
        |  FROM r2 GROUP BY event_type),
        |st AS (
        |  SELECT event_type, na, nb,
        |    CAST(ra2 - na * (na + 1) AS DOUBLE) / 2.0 AS u,
        |    CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0 AS mu,
        |    (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0) *
        |      (CAST(na + nb + 1 AS DOUBLE) - CAST(tie AS DOUBLE) /
        |        (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)))
        |      AS sig2
        |  FROM ag)
        |SELECT event_type, na AS n_a, nb AS n_b, u,
        |  CASE WHEN sig2 > 0 THEN round((u - mu) / sqrt(sig2), 4)
        |       ELSE NULL END AS z
        |FROM st ORDER BY event_type""".stripMargin,

    "stats_chi2" ->
      """WITH obs AS (
        |  SELECT event_type, user_id % 2 = 0 AS arm, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT g.event_type, g.arm, COALESCE(obs.o, 0) AS o
        |  FROM (SELECT t.event_type, a.arm
        |        FROM (SELECT DISTINCT event_type FROM obs) t
        |        CROSS JOIN (SELECT unnest([true, false]) AS arm) a) g
        |  LEFT JOIN obs ON obs.event_type = g.event_type
        |    AND obs.arm = g.arm),
        |t AS (
        |  SELECT event_type, arm, o,
        |    sum(o) OVER () AS n,
        |    sum(o) OVER (PARTITION BY event_type) AS rt,
        |    sum(o) OVER (PARTITION BY arm) AS ct
        |  FROM cells),
        |c AS (
        |  SELECT event_type, o, n,
        |    CASE WHEN rt > 0 AND ct > 0 THEN
        |      round((CAST(o AS DOUBLE) -
        |        CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(o AS DOUBLE) -
        |        CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) /
        |      (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)),
        |      6) ELSE 0.0 END AS contrib
        |  FROM t)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(max(n) AS BIGINT) AS n,
        |  CAST(count(DISTINCT event_type) - 1 AS BIGINT) AS dof,
        |  CAST(sum(CAST(contrib AS DECIMAL(28,6))) AS DOUBLE) AS chi2,
        |  round(sqrt(CAST(sum(CAST(contrib AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(max(n) AS DOUBLE)), 6) AS cramers_v
        |FROM c""".stripMargin,

    "basket_rules" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT ok) AS DOUBLE) AS n_baskets FROM li),
        |item AS (SELECT pk, count(*) AS supp FROM li GROUP BY pk),
        |pair AS (
        |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS supp_ab
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p1, p2, CAST(supp_ab AS BIGINT) AS supp_ab,
        |  CAST(ia.supp AS BIGINT) AS supp_a,
        |  CAST(ib.supp AS BIGINT) AS supp_b,
        |  round(CAST(supp_ab AS DOUBLE) / CAST(ia.supp AS DOUBLE), 6)
        |    AS conf_a_b,
        |  round(CAST(supp_ab AS DOUBLE) / CAST(ib.supp AS DOUBLE), 6)
        |    AS conf_b_a,
        |  round(CAST(supp_ab AS DOUBLE) * nb.n_baskets /
        |    (CAST(ia.supp AS DOUBLE) * CAST(ib.supp AS DOUBLE)), 6) AS lift
        |FROM pair JOIN item ia ON ia.pk = p1 JOIN item ib ON ib.pk = p2, nb
        |ORDER BY lift DESC, p1, p2 LIMIT 20""".stripMargin,

    "stats_anova" ->
      """WITH m AS (
        |  SELECT event_type, CAST(round(value, 4) AS DECIMAL(12,4)) AS v
        |  FROM events),
        |g AS (
        |  SELECT event_type, count(*) AS n, sum(v) AS sv, sum(v * v) AS svv
        |  FROM m GROUP BY event_type),
        |a AS (
        |  SELECT count(*) AS k, sum(n) AS nn,
        |    CAST(sum(sv) AS DOUBLE) AS grand,
        |    CAST(sum(svv) AS DOUBLE) AS sstot,
        |    CAST(sum(CAST(round(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
        |        / CAST(n AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE) AS term
        |  FROM g),
        |b AS (
        |  SELECT k, nn,
        |    term - grand * grand / CAST(nn AS DOUBLE) AS ssb0,
        |    sstot - term AS ssw0
        |  FROM a)
        |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
        |  round(ssb0, 4) AS ss_between, round(ssw0, 4) AS ss_within,
        |  round((ssb0 / (CAST(k AS DOUBLE) - 1)) /
        |    (ssw0 / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))), 4) AS f_stat,
        |  round(ssb0 / (ssb0 + ssw0), 6) AS eta_sq
        |FROM b""".stripMargin,

    "stats_levene" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
        |  FROM events GROUP BY event_type),
        |z AS (
        |  SELECT e.event_type,
        |    CAST(round(abs(e.value - m.med), 4) AS DECIMAL(12,4)) AS z
        |  FROM events e JOIN med m ON m.event_type = e.event_type),
        |g AS (
        |  SELECT event_type, count(*) AS n, sum(z) AS sz, sum(z * z) AS szz
        |  FROM z GROUP BY event_type),
        |a AS (
        |  SELECT count(*) AS k, sum(n) AS nn,
        |    CAST(sum(sz) AS DOUBLE) AS grand,
        |    CAST(sum(szz) AS DOUBLE) AS sstot,
        |    CAST(sum(CAST(round(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
        |        / CAST(n AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE) AS term
        |  FROM g),
        |b AS (
        |  SELECT k, nn,
        |    term - grand * grand / CAST(nn AS DOUBLE) AS ssb0,
        |    sstot - term AS ssw0
        |  FROM a)
        |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
        |  round((ssb0 / (CAST(k AS DOUBLE) - 1)) /
        |    (ssw0 / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))), 4) AS w_stat
        |FROM b""".stripMargin,

    "forecast_holt" ->
      """WITH RECURSIVE yearly AS (
        |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |    round(sum(o_totalprice), 2) AS revenue
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |seq AS (
        |  SELECT n_name, revenue AS x,
        |    row_number() OVER (PARTITION BY n_name ORDER BY o_year) AS rn,
        |    count(*) OVER (PARTITION BY n_name) AS nyr
        |  FROM yearly),
        |ok AS (SELECT * FROM seq WHERE nyr >= 2),
        |r AS (
        |  SELECT s1.n_name, 1 AS t, s1.nyr,
        |    CAST(s1.x AS DOUBLE) AS l,
        |    CAST(s2.x AS DOUBLE) - CAST(s1.x AS DOUBLE) AS b
        |  FROM ok s1 JOIN ok s2 ON s2.n_name = s1.n_name AND s2.rn = 2
        |  WHERE s1.rn = 1
        |  UNION ALL
        |  SELECT r.n_name, r.t + 1, r.nyr,
        |    0.5 * CAST(s.x AS DOUBLE) + 0.5 * (r.l + r.b) AS l,
        |    0.5 * ((0.5 * CAST(s.x AS DOUBLE) + 0.5 * (r.l + r.b)) - r.l)
        |      + 0.5 * r.b AS b
        |  FROM r JOIN ok s ON s.n_name = r.n_name AND s.rn = r.t + 1
        |  WHERE r.t < r.nyr)
        |SELECT n_name, CAST(nyr AS BIGINT) AS n_years,
        |  round(l, 2) AS level, round(b, 2) AS trend,
        |  round(l + b, 2) AS pred_next
        |FROM r WHERE t = nyr ORDER BY n_name""".stripMargin,

    "stats_proportion_z" ->
      """WITH m AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 50.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS xa,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND value > 50.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS xb
        |  FROM events GROUP BY event_type),
        |v AS (
        |  SELECT event_type, na, nb, xa, xb,
        |    CAST(xa AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
        |    CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb,
        |    CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE) AS pp
        |  FROM m)
        |SELECT event_type, na AS n_a, nb AS n_b, xa AS conv_a, xb AS conv_b,
        |  round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
        |  CASE WHEN pp > 0 AND pp < 1 THEN
        |    round((pa - pb) / sqrt(pp * (1.0 - pp) *
        |      (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))), 4)
        |  ELSE NULL END AS z
        |FROM v ORDER BY event_type""".stripMargin,

    "stats_kruskal" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(round(value, 4) AS DECIMAL(12,4)) AS v,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, c,
        |    sum(c) OVER (ORDER BY v
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv,
        |    sum(c) OVER (PARTITION BY v) AS cv
        |  FROM cells),
        |r2 AS (
        |  SELECT event_type, c, 2 * (cumv - cv) + cv + 1 AS r2 FROM rk),
        |grouped AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_g,
        |    sum(CAST(c AS HUGEINT) * r2) AS r2_g
        |  FROM r2 GROUP BY event_type),
        |terms AS (
        |  SELECT n_g,
        |    round((CAST(r2_g AS DOUBLE) / 2.0) * (CAST(r2_g AS DOUBLE) / 2.0)
        |      / CAST(n_g AS DOUBLE), 6) AS term
        |  FROM grouped),
        |tie AS (
        |  SELECT sum(CAST(cv AS HUGEINT) * cv * cv - cv) AS tie
        |  FROM (SELECT CAST(sum(c) AS BIGINT) AS cv FROM cells GROUP BY v)),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS s,
        |    (SELECT CAST(tie AS DOUBLE) FROM tie) AS tie
        |  FROM terms),
        |b AS (
        |  SELECT k, n,
        |    12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * s
        |      - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h0,
        |    1.0 - tie / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS corr
        |  FROM a)
        |SELECT k, n, k - 1 AS dof,
        |  CASE WHEN corr > 0 THEN round(h0 / corr, 4) ELSE NULL END AS h
        |FROM b""".stripMargin,

    "conv_wilson" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS arm,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x
        |  FROM events GROUP BY 1, 2),
        |v AS (
        |  SELECT event_type, arm, n, x,
        |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |    1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE) AS denom,
        |    (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
        |      + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))) /
        |      (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS center,
        |    1.96 * sqrt(((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) *
        |        (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
        |        + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE)))
        |      / CAST(n AS DOUBLE)) /
        |      (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS half
        |  FROM g)
        |SELECT event_type, arm, n, x AS conv, round(p, 6) AS rate,
        |  round(center - half, 6) AS wilson_lo,
        |  round(center + half, 6) AS wilson_hi
        |FROM v ORDER BY event_type, arm""".stripMargin,

    "corr_spearman" ->
      """WITH joint AS MATERIALIZED (
        |  SELECT l_quantity AS x, l_discount AS y, l_tax AS t,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1, 2, 3),
        |cen1 AS (SELECT x AS u, y AS v, CAST(sum(c) AS BIGINT) AS c
        |  FROM joint GROUP BY 1, 2),
        |mu1 AS (SELECT u, sum(c) AS cm FROM cen1 GROUP BY u),
        |ru1 AS (SELECT u, 2 * coalesce(sum(cm) OVER (ORDER BY u
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cm + 1
        |  AS r2 FROM mu1),
        |mv1 AS (SELECT v, sum(c) AS cm FROM cen1 GROUP BY v),
        |rv1 AS (SELECT v, 2 * coalesce(sum(cm) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cm + 1
        |  AS r2 FROM mv1),
        |ag1 AS (
        |  SELECT sum(CAST(c AS HUGEINT)) AS n,
        |    sum(CAST(c AS HUGEINT) * ru1.r2) AS sx,
        |    sum(CAST(c AS HUGEINT) * rv1.r2) AS sy,
        |    sum(CAST(c AS HUGEINT) * ru1.r2 * ru1.r2) AS sxx,
        |    sum(CAST(c AS HUGEINT) * rv1.r2 * rv1.r2) AS syy,
        |    sum(CAST(c AS HUGEINT) * ru1.r2 * rv1.r2) AS sxy
        |  FROM cen1 JOIN ru1 USING (u) JOIN rv1 USING (v)),
        |cen2 AS (SELECT x AS u, t AS v, CAST(sum(c) AS BIGINT) AS c
        |  FROM joint GROUP BY 1, 2),
        |mu2 AS (SELECT u, sum(c) AS cm FROM cen2 GROUP BY u),
        |ru2 AS (SELECT u, 2 * coalesce(sum(cm) OVER (ORDER BY u
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cm + 1
        |  AS r2 FROM mu2),
        |mv2 AS (SELECT v, sum(c) AS cm FROM cen2 GROUP BY v),
        |rv2 AS (SELECT v, 2 * coalesce(sum(cm) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cm + 1
        |  AS r2 FROM mv2),
        |ag2 AS (
        |  SELECT sum(CAST(c AS HUGEINT)) AS n,
        |    sum(CAST(c AS HUGEINT) * ru2.r2) AS sx,
        |    sum(CAST(c AS HUGEINT) * rv2.r2) AS sy,
        |    sum(CAST(c AS HUGEINT) * ru2.r2 * ru2.r2) AS sxx,
        |    sum(CAST(c AS HUGEINT) * rv2.r2 * rv2.r2) AS syy,
        |    sum(CAST(c AS HUGEINT) * ru2.r2 * rv2.r2) AS sxy
        |  FROM cen2 JOIN ru2 USING (u) JOIN rv2 USING (v)),
        |cen3 AS (SELECT y AS u, t AS v, CAST(sum(c) AS BIGINT) AS c
        |  FROM joint GROUP BY 1, 2),
        |mu3 AS (SELECT u, sum(c) AS cm FROM cen3 GROUP BY u),
        |ru3 AS (SELECT u, 2 * coalesce(sum(cm) OVER (ORDER BY u
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cm + 1
        |  AS r2 FROM mu3),
        |mv3 AS (SELECT v, sum(c) AS cm FROM cen3 GROUP BY v),
        |rv3 AS (SELECT v, 2 * coalesce(sum(cm) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cm + 1
        |  AS r2 FROM mv3),
        |ag3 AS (
        |  SELECT sum(CAST(c AS HUGEINT)) AS n,
        |    sum(CAST(c AS HUGEINT) * ru3.r2) AS sx,
        |    sum(CAST(c AS HUGEINT) * rv3.r2) AS sy,
        |    sum(CAST(c AS HUGEINT) * ru3.r2 * ru3.r2) AS sxx,
        |    sum(CAST(c AS HUGEINT) * rv3.r2 * rv3.r2) AS syy,
        |    sum(CAST(c AS HUGEINT) * ru3.r2 * rv3.r2) AS sxy
        |  FROM cen3 JOIN ru3 USING (u) JOIN rv3 USING (v))
        |SELECT pair, n, rho FROM (
        |  SELECT 'quantity_discount' AS pair, CAST(n AS BIGINT) AS n,
        |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |        sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
        |  FROM ag1
        |  UNION ALL
        |  SELECT 'quantity_tax' AS pair, CAST(n AS BIGINT) AS n,
        |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |        sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
        |  FROM ag2
        |  UNION ALL
        |  SELECT 'discount_tax' AS pair, CAST(n AS BIGINT) AS n,
        |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |        sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
        |  FROM ag3)
        |ORDER BY pair""".stripMargin,

    "corr_kendall" ->
      """WITH joint AS MATERIALIZED (
        |  SELECT l_quantity AS x, l_discount AS y, l_tax AS t,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1, 2, 3),
        |cen1 AS (SELECT x AS u, y AS v, CAST(sum(c) AS HUGEINT) AS c
        |  FROM joint GROUP BY 1, 2),
        |cd1 AS (
        |  SELECT
        |    coalesce(sum(CASE WHEN a.v < b.v THEN a.c * b.c END), 0) AS cc,
        |    coalesce(sum(CASE WHEN a.v > b.v THEN a.c * b.c END), 0) AS dd
        |  FROM cen1 a JOIN cen1 b ON a.u < b.u),
        |t1a AS (SELECT sum(tm * (tm - 1)) AS t1, sum(tm) AS n
        |  FROM (SELECT sum(c) AS tm FROM cen1 GROUP BY u)),
        |t2a AS (SELECT sum(tm * (tm - 1)) AS t2
        |  FROM (SELECT sum(c) AS tm FROM cen1 GROUP BY v)),
        |d1 AS (
        |  SELECT n, cc, dd, t1, t2,
        |    sqrt(CAST(n * (n - 1) - t1 AS DOUBLE)) *
        |      sqrt(CAST(n * (n - 1) - t2 AS DOUBLE)) AS den
        |  FROM cd1, t1a, t2a),
        |cen2 AS (SELECT x AS u, t AS v, CAST(sum(c) AS HUGEINT) AS c
        |  FROM joint GROUP BY 1, 2),
        |cd2 AS (
        |  SELECT
        |    coalesce(sum(CASE WHEN a.v < b.v THEN a.c * b.c END), 0) AS cc,
        |    coalesce(sum(CASE WHEN a.v > b.v THEN a.c * b.c END), 0) AS dd
        |  FROM cen2 a JOIN cen2 b ON a.u < b.u),
        |t1b AS (SELECT sum(tm * (tm - 1)) AS t1, sum(tm) AS n
        |  FROM (SELECT sum(c) AS tm FROM cen2 GROUP BY u)),
        |t2b AS (SELECT sum(tm * (tm - 1)) AS t2
        |  FROM (SELECT sum(c) AS tm FROM cen2 GROUP BY v)),
        |d2 AS (
        |  SELECT n, cc, dd, t1, t2,
        |    sqrt(CAST(n * (n - 1) - t1 AS DOUBLE)) *
        |      sqrt(CAST(n * (n - 1) - t2 AS DOUBLE)) AS den
        |  FROM cd2, t1b, t2b),
        |cen3 AS (SELECT y AS u, t AS v, CAST(sum(c) AS HUGEINT) AS c
        |  FROM joint GROUP BY 1, 2),
        |cd3 AS (
        |  SELECT
        |    coalesce(sum(CASE WHEN a.v < b.v THEN a.c * b.c END), 0) AS cc,
        |    coalesce(sum(CASE WHEN a.v > b.v THEN a.c * b.c END), 0) AS dd
        |  FROM cen3 a JOIN cen3 b ON a.u < b.u),
        |t1c AS (SELECT sum(tm * (tm - 1)) AS t1, sum(tm) AS n
        |  FROM (SELECT sum(c) AS tm FROM cen3 GROUP BY u)),
        |t2c AS (SELECT sum(tm * (tm - 1)) AS t2
        |  FROM (SELECT sum(c) AS tm FROM cen3 GROUP BY v)),
        |d3 AS (
        |  SELECT n, cc, dd, t1, t2,
        |    sqrt(CAST(n * (n - 1) - t1 AS DOUBLE)) *
        |      sqrt(CAST(n * (n - 1) - t2 AS DOUBLE)) AS den
        |  FROM cd3, t1c, t2c)
        |SELECT * FROM (
        |  SELECT 'quantity_discount' AS pair, CAST(n AS BIGINT) AS n,
        |    CASE WHEN den > 0 THEN
        |      round(CAST(2 * (cc - dd) AS DOUBLE) / den, 6)
        |    ELSE NULL END AS tau
        |  FROM d1
        |  UNION ALL
        |  SELECT 'quantity_tax' AS pair, CAST(n AS BIGINT) AS n,
        |    CASE WHEN den > 0 THEN
        |      round(CAST(2 * (cc - dd) AS DOUBLE) / den, 6)
        |    ELSE NULL END AS tau
        |  FROM d2
        |  UNION ALL
        |  SELECT 'discount_tax' AS pair, CAST(n AS BIGINT) AS n,
        |    CASE WHEN den > 0 THEN
        |      round(CAST(2 * (cc - dd) AS DOUBLE) / den, 6)
        |    ELSE NULL END AS tau
        |  FROM d3)
        |ORDER BY pair""".stripMargin,

    "item_cosine" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |itemc AS (SELECT pk, CAST(count(*) AS BIGINT) AS ci
        |  FROM li GROUP BY pk),
        |pairs AS (
        |  SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS cij
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT p1, p2, cij FROM pairs
        |  UNION ALL SELECT p2, p1, cij FROM pairs),
        |scored AS (
        |  SELECT s.p1, s.p2, s.cij,
        |    CAST(s.cij AS DOUBLE) / sqrt(CAST(c1.ci * c2.ci AS DOUBLE))
        |      AS cos_raw
        |  FROM sym s
        |  JOIN itemc c1 ON c1.pk = s.p1
        |  JOIN itemc c2 ON c2.pk = s.p2),
        |rk AS (
        |  SELECT p1, p2, cij, cos_raw,
        |    row_number() OVER (PARTITION BY p1
        |      ORDER BY cos_raw DESC, p2) AS rn
        |  FROM scored)
        |SELECT p1 AS item, p2 AS neighbor, cij AS cooc,
        |  round(cos_raw, 6) AS cosine
        |FROM rk WHERE rn <= 5
        |ORDER BY item, cosine DESC, neighbor""".stripMargin,

    "ab_ttest" ->
      """WITH m AS (
        |  SELECT event_type,
        |    CAST(round(value, 4) AS DECIMAL(12,4)) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events),
        |w AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS DOUBLE) AS na,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
        |    CAST(sum(CASE WHEN a THEN v END) AS DOUBLE) AS sa,
        |    CAST(sum(CASE WHEN NOT a THEN v END) AS DOUBLE) AS sb,
        |    CAST(sum(CASE WHEN a THEN v * v END) AS DOUBLE) AS saa,
        |    CAST(sum(CASE WHEN NOT a THEN v * v END) AS DOUBLE) AS sbb
        |  FROM m GROUP BY event_type),
        |v AS (
        |  SELECT event_type, na, nb, sa, sb,
        |    (na * saa - sa * sa) / (na * (na - 1)) / na AS sea,
        |    (nb * sbb - sb * sb) / (nb * (nb - 1)) / nb AS seb
        |  FROM w)
        |SELECT event_type,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(sa / na, 4) AS mean_a, round(sb / nb, 4) AS mean_b,
        |  round((sa / na - sb / nb) / sqrt(sea + seb), 4) AS t_stat,
        |  round((sea + seb) * (sea + seb) /
        |    (sea * sea / (na - 1) + seb * seb / (nb - 1)), 2) AS welch_df
        |FROM v ORDER BY event_type""".stripMargin,

    "ab_cohens_d" ->
      """WITH m AS (
        |  SELECT event_type,
        |    CAST(round(value, 4) AS DECIMAL(12,4)) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events),
        |w AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS DOUBLE) AS na,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
        |    CAST(sum(CASE WHEN a THEN v END) AS DOUBLE) AS sa,
        |    CAST(sum(CASE WHEN NOT a THEN v END) AS DOUBLE) AS sb,
        |    CAST(sum(CASE WHEN a THEN v * v END) AS DOUBLE) AS saa,
        |    CAST(sum(CASE WHEN NOT a THEN v * v END) AS DOUBLE) AS sbb
        |  FROM m GROUP BY event_type),
        |v AS (
        |  SELECT event_type, na, nb, sa, sb,
        |    sqrt(((na - 1) * ((na * saa - sa * sa) / (na * (na - 1)))
        |        + (nb - 1) * ((nb * sbb - sb * sb) / (nb * (nb - 1))))
        |      / (na + nb - 2)) AS pooled
        |  FROM w),
        |d AS (
        |  SELECT event_type, na, nb, pooled,
        |    (sa / na - sb / nb) / pooled AS d
        |  FROM v)
        |SELECT event_type,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CASE WHEN na > 1 AND nb > 1 AND pooled > 0
        |    THEN round(d, 4) ELSE NULL END AS cohens_d,
        |  CASE WHEN na > 1 AND nb > 1 AND pooled > 0
        |    THEN round(d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 4)
        |    ELSE NULL END AS hedges_g
        |FROM d ORDER BY event_type""".stripMargin,

    "ab_srm" ->
      """WITH m AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb
        |  FROM events GROUP BY event_type),
        |v AS (
        |  SELECT event_type, na, nb,
        |    CAST(na + nb AS DOUBLE) / 2.0 AS e
        |  FROM m),
        |c AS (
        |  SELECT event_type, na, nb,
        |    (CAST(na AS DOUBLE) - e) * (CAST(na AS DOUBLE) - e) / e +
        |    (CAST(nb AS DOUBLE) - e) * (CAST(nb AS DOUBLE) - e) / e AS chi2
        |  FROM v)
        |SELECT event_type, na AS n_a, nb AS n_b,
        |  round(chi2, 6) AS chi2, chi2 > 3.841 AS srm_flag
        |FROM c ORDER BY event_type""".stripMargin)
}
