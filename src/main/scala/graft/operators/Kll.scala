package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable rank/quantile sketch with a real error guarantee and NO
  * range pre-pass (VERDICT r13 #3) — the fourth leg of the sketch
  * family (distinct=HLL, frequency=CMS, membership=Bloom, rank=this).
  * [[Sketch.histogramQuantiles]] is equi-width: its error is one bin
  * width, which degrades on heavy-tailed/unknown-range data and needs
  * a min/max pre-pass a stream cannot do. This sketch needs neither.
  *
  * Construction — the KLL level hierarchy with the compaction rule
  * restated so the sketch is a HOMOMORPHISM (the property every
  * sketch in this repo is held to: merge-then-query ≡
  * build-on-the-concatenation BIT-EXACTLY, which classic KLL's
  * promote-half-of-pairs compaction cannot give):
  *
  *  - every row gets a LEVEL = number of leading 1-bits of its 20-bit
  *    md5 slice (deterministic per row id, the fixed-seed discipline
  *    of every sketch here) — P(level ≥ f) = 2^−f exactly;
  *  - the sketch keeps the rows at levels ≥ a capacity-driven FLOOR:
  *    floor = min f such that |{rows : level ≥ f}| ≤ k. "Compaction"
  *    is the floor rising — a whole level is dropped at once, decided
  *    by the per-level counts, never by arrival order;
  *  - because retention is a per-row predicate and the floor is a
  *    function of the (summable) level counts, floors only RISE under
  *    union — so merge = sum the level counts, union the retained
  *    items, re-apply the merged floor: identical to the full build.
  *
  * Estimator: every kept row is a Bernoulli sample with inclusion
  * density 2^−floor, so rank̂(v) = 2^floor · |{kept : x ≤ v}| and
  * quantile(q) = min kept x with rank̂ ≥ q·n (n is EXACT from the
  * level counts; q=1 clamps to the kept max). Rank error is
  * O(n·√(ln(1/δ)/k)) with probability 1−δ — a real distribution-free
  * guarantee, vs KLL's O(n/k) (the price of exact mergeability) and
  * vs the histogram's value-space bin width (no guarantee at all on
  * heavy tails). n ≤ k ⇒ floor 0 ⇒ the sketch is exact.
  *
  * Scale shape: two map-side-combinable passes — a ≤21-row level
  * census, then the floor-filtered (level, x, cnt) census (≈k rows) —
  * no sort, no range pre-pass, no driver collect; every query-time
  * step runs on the k-sized sketch. The census is a plain streaming
  * aggregation (StreamOps.kllCensusStream), so a continuous stream
  * maintains the sketch with the floor applied at read time.
  */
object Kll {

  /** Level cap: 20 md5 bits → P(level = 20) = 2^−20; deeper levels
    * collapse into 20 (harmless: the floor never needs to rise past
    * the level where ~k·2^20 rows remain). */
  val MaxLevel = 20

  /** Leading-one-bit count of the first 20 md5 bits of the row key —
    * geometric with P(level ≥ f) = 2^−f, engine-portable (the
    * hllBucketRank slice discipline). */
  def level(key: Column): Column = {
    val x = conv(substring(md5(key.cast("string")), 1, 5), 16, 10).cast("long")
    (MaxLevel to 1 by -1).foldLeft(null.asInstanceOf[Column]) { (acc, f) =>
      val cond = x >= lit((1L << MaxLevel) - (1L << (MaxLevel - f)))
      if (acc == null) when(cond, lit(f)) else acc.when(cond, lit(f))
    }.otherwise(lit(0)).cast("int")
  }

  /** A built sketch: `levelCounts` = (level, n_rows) for every level
    * present (exact n rides here), `items` = (level, x, cnt) at
    * levels ≥ the build floor. Carrying `k` makes a mismatched merge
    * unrepresentable (the CountMin discipline). */
  final case class KllSketch(levelCounts: DataFrame, items: DataFrame,
                             k: Int)

  /** The 1-row (floor) frame for a level-count table: min level whose
    * SUFFIX count is ≤ k, computed over the FULL 0..MaxLevel spine
    * (a missing level must still be eligible — its suffix equals the
    * next present level's, and picking the higher level would double
    * the estimator weight). */
  def floorOf(levelCounts: DataFrame, k: Int): DataFrame = {
    val spine = levelCounts.sparkSession.range(0, MaxLevel + 1)
      .select(col("id").cast("int").as("level"))
    val sufW = Window.orderBy(col("level").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(levelCounts, Seq("level"), "left")
      .select(col("level"), coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      .withColumn("suffix_n", sum(col("n_rows")).over(sufW))
      .agg(coalesce(min(when(col("suffix_n") <= k, col("level"))),
        lit(MaxLevel)).as("floor"))
  }

  /** Build from (idCol, xCol) rows. `idCol` must be row-unique (the
    * level is hashed from it — hashing the VALUE would correlate a
    * heavy hitter's occurrences and blow the estimator's variance);
    * `xCol` must be integral (the histogramQuantiles contract: the
    * long cast truncates). Nulls carry no rank and are excluded. */
  def build(df: DataFrame, idCol: String, xCol: String, k: Int): KllSketch = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(Set("int", "bigint", "smallint", "tinyint")
      .contains(df.schema(xCol).dataType.simpleString),
      s"$xCol must be an integral type (cast to long truncates), " +
        s"got ${df.schema(xCol).dataType.simpleString}")
    val lv = df.filter(col(xCol).isNotNull)
      .select(level(col(idCol)).as("level"), col(xCol).cast("long").as("x"))
    val counts = lv.groupBy(col("level")).agg(count(lit(1)).as("n_rows"))
    val items = lv.crossJoin(broadcast(floorOf(counts, k)))
      .filter(col("level") >= col("floor"))
      .groupBy(col("level"), col("x")).agg(count(lit(1)).as("cnt"))
    KllSketch(counts, items, k)
  }

  /** Rebuild a sketch from the full (level, x, cnt) census — the
    * streaming path: [[graft.streaming.StreamOps.kllCensusStream]]
    * maintains the census incrementally; this derives the identical
    * sketch from it (level counts are the census's own margins). */
  def fromCensus(census: DataFrame, k: Int): KllSketch = {
    val c = Materialize.cut(census)
    val counts = c.groupBy(col("level")).agg(sum(col("cnt")).as("n_rows"))
    val items = c.crossJoin(broadcast(floorOf(counts, k)))
      .filter(col("level") >= col("floor"))
      .select(col("level"), col("x"), col("cnt"))
    KllSketch(counts, items, k)
  }

  /** Merge: level counts SUM, retained items union under the MERGED
    * floor — floors only rise under union, so every item the merged
    * floor keeps was kept by both inputs' floors, and the result is
    * bit-identical to a full build on the concatenation (KllSpec
    * proves it; the CMS merge-then-estimate ≡ build-on-concat
    * story for ranks). */
  def merge(a: KllSketch, b: KllSketch): KllSketch = {
    require(a.k == b.k, s"KLL merge needs matching k: ${a.k} vs ${b.k}")
    val counts = a.levelCounts.unionByName(b.levelCounts)
      .groupBy(col("level")).agg(sum(col("n_rows")).as("n_rows"))
    val items = a.items.unionByName(b.items)
      .groupBy(col("level"), col("x")).agg(sum(col("cnt")).as("cnt"))
      .crossJoin(broadcast(floorOf(counts, a.k)))
      .filter(col("level") >= col("floor"))
      .select(col("level"), col("x"), col("cnt"))
    KllSketch(counts, items, a.k)
  }

  /** Per-GROUP sketch — the grouped sibling of [[build]] (as
    * hllRegistersGrouped is to hllRegisters): one logical sketch per
    * group value, all in one frame. Floors are per group (computed
    * over each group's own 0..MaxLevel spine), so a small stratum
    * stays exact while a huge one compacts — "p50/p95 doc length per
    * language" with no range pre-pass and no per-group min/max scan.
    * Returns (groupCols…, q, est, floor, n, n_kept) directly: the
    * grouped artifact's serve step is the same query every time, so
    * the sketch frames stay internal here. */
  def quantilesGrouped(df: DataFrame, groupCols: Seq[String], idCol: String,
                       xCol: String, k: Int, qs: Seq[Double]): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(groupCols.nonEmpty, "quantilesGrouped needs group columns " +
      "(use build/quantiles for the global sketch)")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1], got $qs")
    require(Set("int", "bigint", "smallint", "tinyint")
      .contains(df.schema(xCol).dataType.simpleString),
      s"$xCol must be an integral type (cast to long truncates), " +
        s"got ${df.schema(xCol).dataType.simpleString}")
    val g = groupCols.map(col)
    val spark = df.sparkSession
    val lv = df.filter(col(xCol).isNotNull)
      .select(g :+ level(col(idCol)).as("level") :+
        col(xCol).cast("long").as("x"): _*)
    val counts = lv.groupBy(g :+ col("level"): _*)
      .agg(count(lit(1)).as("n_rows"))
    // per-group floor over the full spine (empty levels stay eligible)
    val spine = spark.range(0, MaxLevel + 1)
      .select(col("id").cast("int").as("level"))
    val sufW = Window.partitionBy(g: _*).orderBy(col("level").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val floors = counts.select(g: _*).distinct().crossJoin(spine)
      .join(counts, groupCols :+ "level", "left")
      .select(g :+ col("level") :+
        coalesce(col("n_rows"), lit(0L)).as("n_rows"): _*)
      .withColumn("suffix_n", sum(col("n_rows")).over(sufW))
      .groupBy(g: _*)
      .agg(coalesce(min(when(col("suffix_n") <= k, col("level"))),
        lit(MaxLevel)).as("floor"))
    val items = lv.join(broadcast(floors), groupCols)
      .filter(col("level") >= col("floor"))
      .groupBy(g :+ col("x"): _*).agg(sum(lit(1L)).as("cnt"))
    val ns = counts.groupBy(g: _*).agg(sum(col("n_rows")).as("n"))
    val cumW = Window.partitionBy(g: _*).orderBy(col("x"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = items.withColumn("cum", sum(col("cnt")).over(cumW))
    val qDf = spark.range(1).select(explode(array(qs.map(lit(_)): _*)).as("q"))
    kept.join(broadcast(floors), groupCols)
      .join(broadcast(ns), groupCols)
      .crossJoin(broadcast(qDf))
      .groupBy(g :+ col("q"): _*)
      .agg(
        coalesce(
          min(when(col("cum").cast("double") * pow(lit(2.0), col("floor"))
            >= col("q") * col("n"), col("x"))),
          max(col("x"))).as("est"),
        min(col("floor")).as("floor"),
        min(col("n")).as("n"),
        sum(col("cnt")).as("n_kept"))
  }

  /** Quantile estimates: (q, est, floor, n, n_kept) per requested q.
    * est = min kept x whose weighted cumulative count 2^floor·cum
    * reaches q·n (RANGE cumulative frame — ties at the same x share
    * one cum, so the answer is order-free), clamped to the kept max
    * when sampling undershoots at q→1. Runs entirely on the k-sized
    * sketch + ≤21-row counts. */
  def quantiles(sk: KllSketch, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1], got $qs")
    val fl = floorOf(sk.levelCounts, sk.k)
    val nDf = sk.levelCounts.agg(sum(col("n_rows")).as("n"))
    val cumW = Window.orderBy(col("x"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = sk.items
      .withColumn("cum", sum(col("cnt")).over(cumW))
    val spark = sk.items.sparkSession
    val qDf = spark.range(1).select(explode(array(qs.map(lit(_)): _*)).as("q"))
    kept.crossJoin(broadcast(fl)).crossJoin(broadcast(nDf))
      .crossJoin(broadcast(qDf))
      .groupBy(col("q"))
      .agg(
        coalesce(
          min(when(col("cum").cast("double") * pow(lit(2.0), col("floor"))
            >= col("q") * col("n"), col("x"))),
          max(col("x"))).as("est"),
        min(col("floor")).as("floor"),
        min(col("n")).as("n"),
        sum(col("cnt")).as("n_kept"))
  }
}
