package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PRound
import graft.operators.{Bloom, Merge, Sampling, ZOrder}
import graft.sources.Sinks

/** Block J extension — the storage/pruning/curation side of scale
  * discipline: runtime Bloom pruning, deterministic sampling and
  * train/test splits, CDC upsert merge, and z-order file statistics.
  *
  * Sampling/split/bloom hashing is md5-slice based, so every oracle
  * replays the exact member set in SQL; the merge and bloom-join
  * oracles are the PLAIN formulations (semantics-preserving proofs,
  * like agg_salted/join_salted).
  */
object Layout {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Runtime Bloom pruning: build a filter over BUILDING-segment
    // customer keys (one small-side shuffle into a single packed
    // bitmask row), map-side prune orders BEFORE the join shuffle,
    // then exact-verify. Oracle = the plain join: no false negatives
    // by construction + verify removes false positives.
    "join_bloom" -> { (s, dir) =>
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val bf = Bloom.build(cust, "c_custkey", bits = 1 << 15, hashes = 4)
      val pruned = bf.prune(
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderpriority"), col("o_totalprice")),
        "o_custkey")
      pruned.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          PRound.pround(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    // Deterministic ~20% Bernoulli sample of documents by doc_id hash
    // — map-side predicate, no shuffle; membership is stable across
    // runs/partitionings (df.sample() is not). Oracle replays the md5
    // slot arithmetic.
    "sample_hash" -> { (s, dir) =>
      Sampling.bernoulli(Tables.documents(s, dir), "doc_id", permyriad = 2000)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    },

    // Weighted priority sampling (Efraimidis–Spirakis) in LOG space:
    // rank key = ln(u)/w with u the deterministic md5-slot uniform —
    // monotone in u^(1/w), so the top-20 by key IS the E-S weighted
    // sample without replacement while avoiding cross-engine pow();
    // heavier docs (n_chars) win proportionally more often,
    // deterministically across reruns. Map-side key + a
    // TakeOrderedAndProject top-k — no shuffle anywhere.
    "sample_priority" -> { (s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
        .select(col("doc_id"), col("n_chars"),
          PRound.pround(
            log(Sampling.uniform(col("doc_id"))) / col("n_chars"), 6)
            .as("priority_key"))
        .orderBy(col("priority_key").desc, col("doc_id"))
        .limit(20)
    },

    // Deterministic 80/20 train/test split by doc_id hash — equal keys
    // always co-split (no near-dup leakage across the boundary when
    // the key is the dedup key).
    "split_train_test" -> { (s, dir) =>
      Sampling.splitLabel(Tables.documents(s, dir), "doc_id", testPermyriad = 2000)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"))
    },

    // Per-stratum exact-k quota sample: 5 docs per language, ranked by
    // (md5(doc_id), doc_id) — deterministic, one shuffle on the
    // stratum key.
    "sample_stratified" -> { (s, dir) =>
      Sampling.stratifiedK(Tables.documents(s, dir), Seq("lang"), "doc_id", k = 5)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    },

    // CDC upsert: apply a change batch (updates on orderkey%7=0,
    // deletes on orderkey%13=0, both version 1) to the orders
    // snapshot via the max_by merge — one shuffle, no window sort.
    // Oracle = the equivalent CASE/filter formulation on plain SQL.
    "merge_upsert" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(0L)).withColumn("deleted", lit(false))
      val changes = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 7 === 0 || col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit("M")).otherwise(col("o_orderstatus"))
            .as("o_orderstatus"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
        .withColumn("version", lit(1L))
        .withColumn("deleted", col("o_orderkey") % 13 === 0)
      Merge.upsert(base, changes, Seq("o_orderkey"), "version", "deleted")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          PRound.pround(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("o_orderstatus"))
    },

    // SCD2 history merge: a 4-version change log over order status
    // (v0 snapshot, v1 flips %7 to M, v2 flips %3 to X, v3 re-emits X
    // for %21 — a no-op change that MUST compress away) → validity
    // intervals via one keyed shuffle + lag/lead windows. The oracle
    // is the identical window formulation in plain SQL.
    "merge_scd2" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      def v(filter: Column, status: Column, version: Long): DataFrame =
        o.filter(filter).select(col("o_orderkey"), status.as("o_orderstatus"),
          lit(version).as("version"))
      val log = v(lit(true), col("o_orderstatus"), 0L)
        .unionByName(v(col("o_orderkey") % 7 === 0, lit("M"), 1L))
        .unionByName(v(col("o_orderkey") % 3 === 0, lit("X"), 2L))
        .unionByName(v(col("o_orderkey") % 21 === 0, lit("X"), 3L))
      Merge.scd2(log, Seq("o_orderkey"), "version")
        .orderBy(col("o_orderkey"), col("valid_from"))
    },

    // The SCD2 CONSUMPTION pattern — point-in-time join: each probe
    // (key, as-of version) lands in its validity interval
    // [valid_from, valid_to), open interval = current. The key
    // equality carries the join (one co-keyed shuffle; intervals per
    // key are few so the range predicate filters in place — never a
    // theta join). This closes the loop merge_scd2 opens: history is
    // only useful if you can ask "what was X at time t".
    "scd2_pit_join" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      def v(filter: Column, status: Column, version: Long): DataFrame =
        o.filter(filter).select(col("o_orderkey"), status.as("o_orderstatus"),
          lit(version).as("version"))
      val log = v(lit(true), col("o_orderstatus"), 0L)
        .unionByName(v(col("o_orderkey") % 7 === 0, lit("M"), 1L))
        .unionByName(v(col("o_orderkey") % 3 === 0, lit("X"), 2L))
        .unionByName(v(col("o_orderkey") % 21 === 0, lit("X"), 3L))
      val dim = Merge.scd2(log, Seq("o_orderkey"), "version")
      val probes = o.select(col("o_orderkey"),
        (col("o_orderkey") % 4).as("asof_v"))
      dim.join(probes, Seq("o_orderkey"))
        .filter(col("asof_v") >= col("valid_from") &&
          (col("valid_to").isNull || col("asof_v") < col("valid_to")))
        .select(col("o_orderkey"), col("asof_v"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // CDC changelog apply: one batch carrying update→delete (%10),
    // update-after-update (%25), delete→re-insert (%40) chains per
    // key; the key's final op decides. One max_by shuffle, no window
    // sort. Oracle = the row_number-DESC formulation in plain SQL.
    "merge_cdc_apply" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      def ch(filter: Column, op: String, seq: Long,
             status: Column, price: Column): DataFrame =
        o.filter(filter).select(col("o_orderkey"),
          status.as("o_orderstatus"), price.as("o_totalprice"),
          lit(seq).as("seq"), lit(op).as("op"))
      val log = ch(col("o_orderkey") % 5 === 0, "U", 1L,
          lit("A"), col("o_totalprice") * 1.2)
        .unionByName(ch(col("o_orderkey") % 10 === 0, "D", 2L, lit(""), lit(0.0)))
        .unionByName(ch(col("o_orderkey") % 25 === 0, "U", 3L,
          lit("B"), col("o_totalprice")))
        .unionByName(ch(col("o_orderkey") % 40 === 0, "I", 4L, lit("R"), lit(1.0)))
      Merge.cdcApply(o, log, Seq("o_orderkey"), "seq", "op")
        .select(col("o_orderkey"), col("o_orderstatus"),
          PRound.pround(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // Z-order layout statistics: cluster orders on interleaved
    // (custkey, order-day) bits into 16 z-range "files"; emit the
    // min/max stats a planner prunes with, plus whether each file is
    // skippable for a custkey∈[100,200] predicate — the point of
    // z-order: BOTH dimensions stay bounded per file.
    "zorder_stats" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("o_day"))
      ZOrder.fileStats(o, "o_custkey", "o_day", bits = 10, nBuckets = 16)
        .withColumn("skip_cust_100_200",
          col("max_a") < 100 || col("min_a") > 200)
        .orderBy(col("bucket"))
    },

    // Small-file compaction, end to end: reproduce the append-batch
    // mess (8 worker batches appended to a lang-partitioned dir, one
    // file per batch per touched partition — the reference's
    // save_worker_batch shape, scraper_v2.py:1334-1356), run
    // Sinks.compact with a 1 GiB target (→ exactly one file per leaf),
    // and report per-lang rows + file counts BEFORE/AFTER from the
    // actual filesystem listing joined with the post-compaction
    // read-back. The oracle derives the same numbers from the DATA
    // alone: files_before per lang = #distinct batch shards holding
    // that lang; n_rows/total_chars from the read-back pin row-level
    // preservation through the rewrite.
    "compact_stats" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-compact")
        .toString + "/docs"
      (0 until 8).foreach { sh =>
        docs.filter(pmod(col("doc_id"), lit(8)) === sh).coalesce(1)
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .partitionBy("lang").parquet(tmp)
      }
      val stats = s.createDataFrame(Sinks.compact(s, tmp, targetBytes = 1L << 30))
        .select(regexp_extract(col("partition"), "lang=(.*)", 1).as("lang"),
          col("filesBefore").as("files_before"), col("filesAfter").as("files_after"))
      s.read.parquet(tmp)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("total_chars"))
        .join(broadcast(stats), Seq("lang"))
        .orderBy(col("lang"))
    },

    // Dynamic partition pruning fired for real: orders lands
    // partitioned by year (the standard fact layout), the dim side
    // carries a non-pushable flag filter, and the join key IS the
    // partition column — Spark's DPP turns the dim's surviving keys
    // into a runtime partition filter, so the fact scan reads ONE
    // year's files instead of seven (plan-gated in PlanShapeSpec:
    // `dynamicpruning` inside PartitionFilters). The oracle replays
    // the join against the same inline dim. The partitioned copy
    // lands at a CONTENT-keyed path (sources.DatasetCache: the key
    // folds in orders.parquet's size+mtime, so regenerating the
    // dataset at the same dir invalidates it — ADVICE r9 — and the
    // lock-gated build is written ONCE even under concurrent first
    // runs) — Bench's 5-rep loop times the DPP probe, not four
    // redundant full rewrites, and repeated rounds reuse instead of
    // leaking temp dirs.
    "join_dpp" -> { (s, dir) =>
      val tmp = graft.sources.DatasetCache.getOrBuild(
          dir, Seq("orders.parquet"), "orders_by_year") { path =>
        Tables.orders(s, dir)
          .withColumn("o_year", year(col("o_orderdate")))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("o_year").parquet(path)
      }
      val dim = s.range(1995, 2002)
        .select(col("id").cast("int").as("d_year"),
          (col("id") % 7 === 3).as("target")) // 1998
      s.read.parquet(tmp)
        .join(dim.filter(col("target")), col("o_year") === col("d_year"))
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n_orders"),
          PRound.pround(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("o_year"))
    },

    // Hilbert layout statistics — zorder_stats' twin on the
    // better-locality curve (native codegen'd xy2d loop; the oracle
    // replays the SAME loop as a recursive CTE over bit levels).
    // 8 bits keeps the oracle's per-row recursion shallow while the
    // Spark side exercises the identical expression it would run at
    // any width.
    "hilbert_stats" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("o_day"))
      ZOrder.hilbertStats(o, "o_custkey", "o_day", bits = 8, nBuckets = 16)
        .withColumn("skip_cust_100_200",
          col("max_a") < 100 || col("min_a") > 200)
        .orderBy(col("bucket"))
    })

  /** DuckDB nibble arithmetic for md5 slices (same trick as
    * Scale.oracle): value of the `n` hex chars of `h` starting at
    * 1-based offset `off`. */
  private def hexN(h: String, off: Int, n: Int): String =
    (0 until n).map { i =>
      val mult = 1L << (4 * (n - 1 - i))
      s"(strpos('0123456789abcdef', substr($h, ${off + i}, 1)) - 1) * $mult"
    }.mkString(" + ")

  /** md5-slot sampling predicate: slot(key) < permyriad (32-bit slice,
    * matching operators.Sampling.slot's bias bound). */
  private def slotPred(keyExpr: String, permyriad: Int): String =
    s"(${hexN(s"md5(CAST($keyExpr AS VARCHAR))", 1, 8)}) % 10000 < $permyriad"

  /** DuckDB replay of the Hilbert xy2d loop (the exact algorithm in
    * functions.expr.HilbertIndex): a recursive CTE over bit levels
    * carrying each row's rotated (x, y) state and accumulated d.
    * `src` must expose columns a, b already reduced mod 2^bits. */
  private def hilbertSql(src: String, bits: Int): String = {
    val s = "(CAST(1 AS BIGINT) << lvl)"
    val nm1 = (1L << bits) - 1 // reflection is within the FULL n-grid
    s"""hil AS (
       |  SELECT a, b, CAST(a AS BIGINT) AS x, CAST(b AS BIGINT) AS y,
       |    CAST(0 AS BIGINT) AS d, ${bits - 1} AS lvl
       |  FROM $src
       |  UNION ALL
       |  SELECT a, b,
       |    CASE WHEN (y & $s) = 0
       |         THEN CASE WHEN (x & $s) <> 0 THEN $nm1 - y ELSE y END
       |         ELSE x END,
       |    CASE WHEN (y & $s) = 0
       |         THEN CASE WHEN (x & $s) <> 0 THEN $nm1 - x ELSE x END
       |         ELSE y END,
       |    d + $s * $s * xor(
       |      3 * (CASE WHEN (x & $s) <> 0 THEN 1 ELSE 0 END),
       |      CASE WHEN (y & $s) <> 0 THEN 1 ELSE 0 END),
       |    lvl - 1
       |  FROM hil WHERE lvl >= 0)""".stripMargin
  }

  /** DuckDB Morton interleave of (a % 2^bits, b % 2^bits). */
  private def zvalueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(($a & ${1L << i}) * ${1L << i} + ($b & ${1L << i}) * ${1L << (i + 1)})"
    }.mkString(" + ")

  def oracle: Map[String, String] = Map(
    "join_bloom" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "sample_hash" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents
         |WHERE ${slotPred("doc_id", 2000)}
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "sample_priority" ->
      s"""SELECT doc_id, n_chars,
         |  round(ln(((${hexN("md5(CAST(doc_id AS VARCHAR))", 1, 8)}) % 10000
         |    + 1) / 10000.0) / n_chars, 6) AS priority_key
         |FROM documents
         |ORDER BY priority_key DESC, doc_id LIMIT 20""".stripMargin,

    "split_train_test" ->
      s"""SELECT CASE WHEN ${slotPred("doc_id", 2000)}
         |            THEN 'test' ELSE 'train' END AS split,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,

    "sample_stratified" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT lang, doc_id FROM ranked WHERE rk <= 5
        |ORDER BY lang, doc_id""".stripMargin,

    "merge_upsert" ->
      """WITH merged AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'M' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 13 <> 0)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "merge_scd2" ->
      """WITH log AS (
        |  SELECT o_orderkey, o_orderstatus, CAST(0 AS BIGINT) AS version
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'M', 1 FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'X', 2 FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'X', 3 FROM orders WHERE o_orderkey % 21 = 0),
        |flagged AS (
        |  SELECT o_orderkey, o_orderstatus, version,
        |    lag(o_orderstatus) OVER (PARTITION BY o_orderkey
        |      ORDER BY version) AS prev
        |  FROM log),
        |changed AS (
        |  SELECT o_orderkey, o_orderstatus, version FROM flagged
        |  WHERE prev IS NULL OR prev <> o_orderstatus)
        |SELECT o_orderkey, o_orderstatus, version AS valid_from,
        |  lead(version) OVER (PARTITION BY o_orderkey
        |    ORDER BY version) AS valid_to
        |FROM changed ORDER BY o_orderkey, valid_from""".stripMargin,

    "scd2_pit_join" ->
      """WITH log AS (
        |  SELECT o_orderkey, o_orderstatus, CAST(0 AS BIGINT) AS version
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'M', 1 FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'X', 2 FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'X', 3 FROM orders WHERE o_orderkey % 21 = 0),
        |flagged AS (
        |  SELECT o_orderkey, o_orderstatus, version,
        |    lag(o_orderstatus) OVER (PARTITION BY o_orderkey
        |      ORDER BY version) AS prev
        |  FROM log),
        |changed AS (
        |  SELECT o_orderkey, o_orderstatus, version FROM flagged
        |  WHERE prev IS NULL OR prev <> o_orderstatus),
        |dim AS (
        |  SELECT o_orderkey, o_orderstatus, version AS valid_from,
        |    lead(version) OVER (PARTITION BY o_orderkey
        |      ORDER BY version) AS valid_to
        |  FROM changed),
        |probes AS (SELECT o_orderkey, o_orderkey % 4 AS asof_v FROM orders)
        |SELECT p.o_orderkey, p.asof_v, d.o_orderstatus
        |FROM probes p JOIN dim d ON p.o_orderkey = d.o_orderkey
        |WHERE p.asof_v >= d.valid_from
        |  AND (d.valid_to IS NULL OR p.asof_v < d.valid_to)
        |ORDER BY p.o_orderkey""".stripMargin,

    "merge_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_orderkey, 'A' AS st, o_totalprice * 1.2 AS price,
        |    1 AS seq, 'U' AS op FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, '', 0.0, 2, 'D' FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'B', o_totalprice, 3, 'U' FROM orders
        |  WHERE o_orderkey % 25 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'R', 1.0, 4, 'I' FROM orders
        |  WHERE o_orderkey % 40 = 0),
        |all_rows AS (
        |  SELECT o_orderkey, o_orderstatus AS st, o_totalprice AS price,
        |    -1 AS seq, 'I' AS op FROM orders
        |  UNION ALL SELECT * FROM log),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY seq DESC) AS rk
        |  FROM all_rows)
        |SELECT o_orderkey, st AS o_orderstatus,
        |  round(price, 2) AS o_totalprice
        |FROM ranked WHERE rk = 1 AND op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,

    "compact_stats" ->
      """SELECT lang, count(*) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  count(DISTINCT ((doc_id % 8) + 8) % 8) AS files_before,
        |  CAST(1 AS BIGINT) AS files_after
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "join_dpp" ->
      """WITH dim AS (
        |  SELECT CAST(y AS INT) AS d_year, (y % 7 = 3) AS target
        |  FROM (SELECT unnest(range(1995, 2002)) AS y)),
        |f AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_totalprice
        |      FROM orders)
        |SELECT o_year, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM f JOIN dim ON o_year = d_year
        |WHERE target
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "hilbert_stats" -> {
      // bits=8 -> d in [0, 65536); 16 buckets -> width 4096
      s"""WITH RECURSIVE dims AS (
         |  SELECT ((o_custkey % 256) + 256) % 256 AS a,
         |    ((date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) % 256)
         |      + 256) % 256 AS b
         |  FROM orders),
         |${hilbertSql("dims", 8)}
         |SELECT d // 4096 AS bucket, count(*) AS n_rows,
         |  min(a) AS min_a, max(a) AS max_a,
         |  min(b) AS min_b, max(b) AS max_b,
         |  (max(a) < 100 OR min(a) > 200) AS skip_cust_100_200
         |FROM hil WHERE lvl = -1
         |GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "zorder_stats" -> {
      val zv = zvalueSql("a", "b", 10)
      s"""WITH dims AS (
         |  SELECT ((o_custkey % 1024) + 1024) % 1024 AS a,
         |    ((date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) % 1024)
         |      + 1024) % 1024 AS b
         |  FROM orders),
         |zed AS (SELECT a, b, ($zv) // 65536 AS bucket FROM dims)
         |SELECT bucket, count(*) AS n_rows,
         |  min(a) AS min_a, max(a) AS max_a,
         |  min(b) AS min_b, max(b) AS max_b,
         |  (max(a) < 100 OR min(a) > 200) AS skip_cust_100_200
         |FROM zed GROUP BY bucket ORDER BY bucket""".stripMargin
    })
}
