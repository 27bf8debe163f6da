package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (latest right row at-or-before each left
  * row's timestamp, per key).
  *
  * Implemented as the scalable union-and-sweep plan rather than a
  * range join: tag both sides, union them, and sweep a single
  * `last_value(..., ignoreNulls)` window ordered by (ts, side) within
  * each key. One shuffle on the key, one sort — no per-row range
  * probe, no broadcast requirement, and skew behaves like any window
  * (AQE-splittable). A naive `l.ts >= r.ts` theta-join would be a
  * per-key cross product — quadratic on hot keys at 100 TB.
  *
  * Right rows sort before left rows at an equal timestamp, making the
  * join inclusive (ties match), like DuckDB's ASOF JOIN.
  */
object AsOf {

  /** @param left       probe side
    * @param right      reference side (its latest row <= left.ts wins)
    * @param keyCols    equi-key column names present on both sides
    * @param leftTs     left timestamp column
    * @param rightTs    right timestamp column
    * @param rightVals  right columns to carry (null when no match)
    */
  def join(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String]): DataFrame =
    sweep(left, right, keyCols, leftTs, rightTs, rightVals, forward = false)

  /** FORWARD as-of: the EARLIEST right row at-or-after each left
    * row's timestamp, per key — the "next event after" shape
    * (next restock after a stock-out, next response after a request).
    * Same union-and-sweep plan, ordered descending, so the cost is
    * identical to the backward join: one shuffle, one sort. */
  def joinForward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String]): DataFrame =
    sweep(left, right, keyCols, leftTs, rightTs, rightVals, forward = true)

  /** NEAREST as-of: the right row MINIMIZING |right.ts − left.ts| per
    * key, tie → the backward (at-or-before) row — the sensor-alignment
    * shape (closest reading to each sample, either side).
    *
    * Plan: ONE union + ONE shuffle on the key carrying BOTH sweeps —
    * the ascending (backward) and descending (forward) windows share
    * the key partitioning, so the second window adds an
    * intra-partition sort, not an exchange. The per-row pick is then
    * map-side arithmetic on the two carried structs.
    *
    * Duplicate right timestamps stay deterministic per direction (the
    * sweep's trailing `__r` order), and a cross-direction distance tie
    * always resolves backward. Timestamps/dates are compared in µs /
    * days; numeric ts columns compare as-is. */
  def joinNearest(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DateType, StructField, StructType, TimestampType}
    val leftCols = left.columns.toSeq
    require(rightVals.forall(v => !leftCols.contains(v)),
      s"rightVals ${rightVals.filter(leftCols.contains)} collide with left columns — rename first")
    // __m/__ts0 are struct-INTERNAL: a rightVals column with either
    // name would duplicate a struct field and getField would silently
    // resolve to the wrong one
    requireNoReserved(left, right,
      Seq("__ts", "__side", "__r", "__rb", "__rf", "__rp", "__m", "__ts0"))
    def tsNum(c: org.apache.spark.sql.Column,
              dt: org.apache.spark.sql.types.DataType) = dt match {
      case TimestampType => unix_micros(c)
      case DateType => unix_date(c)
      case _ => c
    }
    val rType = StructType(
      StructField("__m", org.apache.spark.sql.types.BooleanType, nullable = false) +:
        StructField("__ts0", right.schema(rightTs).dataType) +:
        rightVals.map(v => right.schema(v)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(rType).as("__r"): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(lit(true).as("__m") +: col(rightTs).as("__ts0") +:
          rightVals.map(v => col(v).as(v)): _*).as("__r"): _*)
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").desc, col("__side"), col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsDt = right.schema(rightTs).dataType
    val swept = l.unionByName(r)
      .withColumn("__rb", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__rf", last(col("__r"), ignoreNulls = true).over(wF))
    val bDist = tsNum(col("__ts"), tsDt) - tsNum(col("__rb").getField("__ts0"), tsDt)
    val fDist = tsNum(col("__rf").getField("__ts0"), tsDt) - tsNum(col("__ts"), tsDt)
    val pick = when(col("__rf").isNull, col("__rb"))
      .when(col("__rb").isNull, col("__rf"))
      .when(fDist < bDist, col("__rf"))
      .otherwise(col("__rb"))
    swept.filter(col("__side") === 1)
      .withColumn("__rp", pick)
      .select(leftCols.map(col) ++
        rightVals.map(v => col("__rp").getField(v).as(v)): _*)
  }

  /** TOLERANCE as-of: the backward join, but a match STALER than
    * `toleranceUs` microseconds (days for DateType keys) is discarded —
    * right columns come back null, the left row survives. This is
    * pandas merge_asof's `tolerance` / the sensor-staleness guard: a
    * reading older than the freshness budget must not be carried
    * forward as if current.
    *
    * Same union-and-sweep plan and cost as [[join]] (one shuffle on
    * the key, one sort); the carried struct additionally holds the
    * matched right timestamp and the staleness check is map-side
    * arithmetic on it. Tie handling matches [[join]]: right rows sort
    * before left at equal ts (inclusive), duplicate right timestamps
    * resolve to the greatest carried tuple. */
  def joinTolerance(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String], toleranceUs: Long): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, DateType, StructField, StructType, TimestampType}
    require(toleranceUs >= 0L, s"tolerance must be >= 0, got $toleranceUs")
    val leftCols = left.columns.toSeq
    require(rightVals.forall(v => !leftCols.contains(v)),
      s"rightVals ${rightVals.filter(leftCols.contains)} collide with left columns — rename first")
    // __m/__ts0 are struct-internal here too — see joinNearest
    requireNoReserved(left, right,
      Seq("__ts", "__side", "__r", "__rs", "__m", "__ts0"))
    val rType = StructType(
      StructField("__m", BooleanType, nullable = false) +:
        StructField("__ts0", right.schema(rightTs).dataType) +:
        rightVals.map(v => right.schema(v)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(rType).as("__r"): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(lit(true).as("__m") +: col(rightTs).as("__ts0") +:
          rightVals.map(v => col(v).as(v)): _*).as("__r"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsDt = right.schema(rightTs).dataType
    def tsNum(c: org.apache.spark.sql.Column) = tsDt match {
      case TimestampType => unix_micros(c)
      case DateType => unix_date(c)
      case _ => c
    }
    val swept = l.unionByName(r)
      .withColumn("__rs", last(col("__r"), ignoreNulls = true).over(w))
    val fresh = col("__rs").isNotNull &&
      (tsNum(col("__ts")) - tsNum(col("__rs").getField("__ts0"))) <= toleranceUs
    swept.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => when(fresh, col("__rs").getField(v)).as(v)): _*)
  }

  /** Inputs carrying one of the sweep's internal column names would be
    * silently clobbered (wrong results, not an error) — same reserved-
    * name contract as Merge.cdcApply / RangeJoin.intervalOverlap. */
  private def requireNoReserved(left: DataFrame, right: DataFrame,
                                reserved: Seq[String]): Unit = {
    val hit = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(hit.isEmpty,
      s"inputs must not carry reserved column(s) ${hit.mkString(", ")} " +
        "(internal to the as-of sweep) — rename first")
  }

  private def sweep(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightVals.forall(v => !leftCols.contains(v)),
      s"rightVals ${rightVals.filter(leftCols.contains)} collide with left columns — rename first")
    requireNoReserved(left, right, Seq("__ts", "__side", "__r", "__rs", "__m"))
    // All carried right columns travel in ONE struct with a non-null
    // marker field, and a single ignoreNulls sweep carries the whole
    // struct: every output value comes from the SAME matched right
    // row. (Independent per-column sweeps would backfill a right
    // column that is legitimately NULL on the matching row from an
    // older right row, silently mixing rows.)
    val rType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__m",
        org.apache.spark.sql.types.BooleanType, nullable = false) +:
        rightVals.map(v => right.schema(v)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(rType).as("__r"): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct((lit(true).as("__m") +: rightVals.map(v => col(v).as(v))): _*).as("__r"): _*)
    // Backward: ascending sweep — last right row seen is the latest
    // <= current ts. Forward: DESCENDING sweep — last right row seen
    // is the earliest >= current ts. Either way, right rows (__side=0)
    // sort before left rows at an equal timestamp → ties match
    // (inclusive), like DuckDB's ASOF JOIN. The trailing __r order
    // makes DUPLICATE right timestamps deterministic (the sweep's
    // winner is the last equal-ts right row seen): backward keeps the
    // GREATEST rightVals tuple, forward the SMALLEST — without it the
    // carried value would depend on partitioning.
    val ord =
      if (forward) Seq(col("__ts").desc, col("__side"), col("__r").desc)
      else Seq(col("__ts"), col("__side"), col("__r"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = l.unionByName(r)
      .withColumn("__rs", last(col("__r"), ignoreNulls = true).over(w))
    swept.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col("__rs").getField(v).as(v)): _*)
  }
}
