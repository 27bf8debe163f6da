package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructType}

/** File ingestion, re-expressing the reference's input layer
  * (`get_companies_from_file`, scraper_v2.py:458-577) on Spark's
  * distributed readers: CSV with header + explicit-or-inferred
  * schema, plain text (one record per line), and parquet. The
  * reference's Excel path (scraper_v2.py:523-556) is covered by
  * [[Xlsx]] — a zero-dependency distributed workbook parser over the
  * binaryFile source.
  *
  * Column auto-detection (scraper_v2.py:492-498: prefer the named
  * column, fall back to `company_name`, then the first column) is
  * `resolveColumn`; the entity filter and dedup-with-preference are
  * `entities`.
  */
object FileIngest {

  /** Header'd CSV; `schema=None` → schema inference (two-pass — at
    * 100 TB callers should pass the schema). multiLine stays off so
    * the read is splittable. */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
          delimiter: String = ","): DataFrame = {
    val r = spark.read.option("header", "true").option("delimiter", delimiter)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** One trimmed, non-empty line per row (scraper_v2.py:558-564). */
  def textLines(spark: SparkSession, path: String, colName: String = "value"): DataFrame =
    spark.read.text(path)
      .select(trim(col("value")).as(colName))
      .filter(length(col(colName)) > 0)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC — Spark-native columnar twin of parquet (predicate pushdown,
    * column pruning, splittable stripes); rounds out the format
    * matrix for warehouses that standardized on ORC. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines (one object per line — splittable). `schema=None` →
    * inference (two-pass; pass the schema at scale). multiLine stays
    * off for the same reason as CSV. */
  def jsonLines(spark: SparkSession, path: String,
                schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  /** Extension-dispatched read (the reference's input switch,
    * scraper_v2.py:470-486: CSV / Excel / text by suffix), consuming
    * `cfg.sheet` for workbooks. Legacy `.xls` goes through [[Xls]]
    * (zero-dependency OLE2/BIFF8 reader — BIFF5 and encrypted
    * workbooks still fail fast with a conversion hint). */
  def auto(spark: SparkSession, path: String, cfg: GraftConfig): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv")) csv(spark, path)
    else if (lower.endsWith(".xlsx"))
      cfg.sheet.fold(Xlsx.table(spark, path))(nm => Xlsx.table(spark, path, nm))
    else if (lower.endsWith(".xls"))
      cfg.sheet.fold(Xls.table(spark, path))(nm => Xls.table(spark, path, nm))
    else if (lower.endsWith(".txt")) textLines(spark, path, "company_name")
    else if (lower.endsWith(".jsonl") || lower.endsWith(".json")) jsonLines(spark, path)
    else if (lower.endsWith(".orc")) orc(spark, path)
    else if (lower.endsWith(".avro")) Avro.read(spark, path)
    else parquet(spark, path)
  }

  /** scraper_v2.py:492-498 — pick the entity-name column: the
    * requested one if present, else `company_name`, else the first. */
  def resolveColumn(df: DataFrame, requested: Option[String],
                    fallback: String = "company_name"): String =
    requested.filter(df.columns.contains)
      .orElse(Option(fallback).filter(df.columns.contains))
      .getOrElse(df.columns.head)

  /** scraper_v2.py:507-520 — the full ingestion transform: filter by
    * an entity predicate, validate the id column against a pattern
    * (invalid → null), dedup by name preferring rows that carry a
    * valid id. One shuffle (groupBy name). */
  def entities(df: DataFrame, nameCol: String, idCol: Option[String],
               entityMarkers: Seq[String], idPattern: String): DataFrame = {
    val name = trim(col(nameCol))
    val marked = entityMarkers.foldLeft(lit(entityMarkers.isEmpty))(
      (acc, m) => acc || name.contains(m))
    val id = idCol.map(c => when(col(c).rlike(idPattern), col(c))).getOrElse(lit(null))
    df.filter(length(name) > 0 && marked)
      .select(name.as("name"), id.cast("string").as("id"))
      .groupBy(col("name"))
      // max_by prefers the non-null id (nulls sort first in the struct);
      // single map-side-combinable aggregate, same as the reference's
      // "keep the record that has a reg number".
      .agg(max(col("id")).as("id"))
  }

  // integral / fractional widening ladders for unionEvolved
  private val intRank = Map[DataType, Int](ByteType -> 0, ShortType -> 1,
    IntegerType -> 2, LongType -> 3)
  private val fracRank = Map[DataType, Int](FloatType -> 0, DoubleType -> 1)

  /** Widest common type of two drifted column types, if safely
    * widenable: integral→wider integral, fractional→wider fractional,
    * int-or-narrower + fractional→double (a double holds every int32
    * exactly). LONG + fractional is a REAL conflict, not a widening —
    * longs above 2^53 would silently lose precision in a double, which
    * breaks this function's fail-rather-than-coerce contract. Anything
    * else is likewise a conflict — fail with the column visible. */
  private def widen(name: String, a: DataType, b: DataType): DataType =
    if (a == b) a
    else if (intRank.contains(a) && intRank.contains(b)) {
      if (intRank(a) >= intRank(b)) a else b
    } else if (fracRank.contains(a) && fracRank.contains(b)) {
      if (fracRank(a) >= fracRank(b)) a else b
    } else if ((intRank.contains(a) && fracRank.contains(b)) ||
      (fracRank.contains(a) && intRank.contains(b))) {
      val integral = if (intRank.contains(a)) a else b
      if (integral == LongType) throw new IllegalArgumentException(
        s"schema conflict on column '$name': $a vs $b — LONG values " +
          "above 2^53 don't fit a DOUBLE exactly; cast the writer " +
          "explicitly or read the batches separately")
      DoubleType
    } else throw new IllegalArgumentException(
      s"schema conflict on column '$name': $a vs $b — not widenable; " +
        "fix the writer or read the batches separately")

  /** Read several append batches whose schemas DRIFTED — the 100 TB
    * operational reality: months of `save_worker_batch`-style appends
    * (scraper_v2.py:1334-1356) accumulate added columns and
    * int→long / float→double widenings as the producer evolves.
    * Reconciles to the widest schema (first-seen column order),
    * null-fills columns a batch predates, casts each batch to the
    * reconciled types, and unions BY NAME. Parquet's own
    * `mergeSchema` handles added columns but FAILS on int→long
    * drift; this handles both, and refuses genuinely conflicting
    * types with the column named. Each batch stays its own pruned,
    * pushdown-capable scan — the union is planless glue, no shuffle.
    */
  def unionEvolved(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "unionEvolved needs at least one path")
    val frames = paths.map(p => spark.read.parquet(p))
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    frames.foreach(_.schema.fields.foreach { f =>
      merged(f.name) = merged.get(f.name)
        .map(widen(f.name, _, f.dataType)).getOrElse(f.dataType)
    })
    frames.map { df =>
      val present = df.columns.toSet
      df.select(merged.toSeq.map { case (name, dt) =>
        if (present.contains(name)) col(name).cast(dt).as(name)
        else lit(null).cast(dt).as(name)
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
