package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.SparkSpec

/** unionEvolved: drifted append batches reconcile to the widest
  * schema — added columns null-fill, int→long and float→double widen,
  * integral+fractional meet at double, and a genuine type conflict
  * (string vs int) refuses with the column named instead of coercing.
  */
class UnionEvolvedSpec extends SparkSpec {
  import spark.implicits._

  private def root = Files.createTempDirectory("graft-evolve").toString

  test("drifted batches reconcile: widened types, null-filled columns, all rows") {
    val r = root
    // batch 1: the original producer (id int, v float, a string)
    Seq((1, 1.5f, "x"), (2, 2.5f, "y")).toDF("id", "v", "a")
      .write.parquet(s"$r/b1")
    // batch 2: id widened to long, v to double, new column b
    Seq((3L, 3.5d, "z", 30L)).toDF("id", "v", "a", "b")
      .write.parquet(s"$r/b2")
    // batch 3: predates column v entirely
    Seq((4, "w")).toDF("id", "a").write.parquet(s"$r/b3")

    val df = FileIngest.unionEvolved(spark, Seq(s"$r/b1", s"$r/b2", s"$r/b3"))
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "a", "b"))
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("v").dataType == DoubleType)
    assert(df.schema("a").dataType == StringType)
    assert(df.schema("b").dataType == LongType)
    assert(df.count() == 4)
    val rows = df.orderBy("id")
      .select(col("id"), col("v"), col("a"), col("b"))
      .collect().map(x => (x.get(0), x.get(1), x.get(2), x.get(3))).toSeq
    assert(rows == Seq(
      (1L, 1.5d, "x", null), (2L, 2.5d, "y", null),
      (3L, 3.5d, "z", 30L), (4L, null, "w", null)))
  }

  test("integral + fractional drift meets at double") {
    val r = root
    Seq((1, 10)).toDF("id", "m").write.parquet(s"$r/b1")
    Seq((2, 1.5d)).toDF("id", "m").write.parquet(s"$r/b2")
    val df = FileIngest.unionEvolved(spark, Seq(s"$r/b1", s"$r/b2"))
    assert(df.schema("m").dataType == DoubleType)
    assert(df.select(sum(col("m"))).head().getDouble(0) == 11.5)
  }

  test("long + fractional drift refuses — 2^53 precision loss is not a widening") {
    val r = root
    Seq((1, 9007199254740993L)).toDF("id", "m").write.parquet(s"$r/b1")
    Seq((2, 1.5d)).toDF("id", "m").write.parquet(s"$r/b2")
    val e = intercept[IllegalArgumentException] {
      FileIngest.unionEvolved(spark, Seq(s"$r/b1", s"$r/b2"))
    }
    assert(e.getMessage.contains("'m'") && e.getMessage.contains("2^53"))
  }

  test("a real conflict refuses with the column named") {
    val r = root
    Seq((1, "abc")).toDF("id", "k").write.parquet(s"$r/b1")
    Seq((2, 42)).toDF("id", "k").write.parquet(s"$r/b2")
    val e = intercept[IllegalArgumentException] {
      FileIngest.unionEvolved(spark, Seq(s"$r/b1", s"$r/b2"))
    }
    assert(e.getMessage.contains("'k'"))
  }
}
