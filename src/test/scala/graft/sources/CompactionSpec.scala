package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sinks.compact: small-file re-binpacking of an append directory.
  * Contract under test — (1) read-back row MULTISET is unchanged, (2)
  * the per-partition file count lands at ceil(bytes/target), (3) hive
  * partitioning survives (values still come from directory names), (4)
  * already-compact partitions are untouched (same file paths), and (5)
  * the stats rows account before/after faithfully.
  */
class CompactionSpec extends SparkSpec {

  private def mess(dir: String, batches: Int): Unit = {
    import spark.implicits._
    // `batches` appended worker batches over a 2-partition layout —
    // each append leaves one file per touched leaf.
    (0 until batches).foreach { b =>
      (0 until 50).map { i => (b * 50L + i, if (i % 2 == 0) "a" else "b", s"v$b-$i") }
        .toDF("id", "part", "payload")
        .coalesce(1)
        .write.mode("append").partitionBy("part").parquet(dir)
    }
  }

  test("compact preserves the row multiset and hive partitioning") {
    val dir = Files.createTempDirectory("graft-compact-spec").toString + "/t"
    mess(dir, batches = 6)
    val before = spark.read.parquet(dir)
      .groupBy(col("id"), col("part"), col("payload")).count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val stats = Sinks.compact(spark, dir, targetBytes = 1L << 30)
    val after = spark.read.parquet(dir)
      .groupBy(col("id"), col("part"), col("payload")).count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(after === before)
    assert(stats.map(_.partition).sorted === Seq("part=a", "part=b"))
    stats.foreach { st =>
      assert(st.filesBefore === 6L)
      assert(st.filesAfter === 1L)
      assert(st.bytesBefore > 0 && st.bytesAfter > 0)
    }
  }

  test("file count lands at ceil(bytes/target) under a mid-size target") {
    val dir = Files.createTempDirectory("graft-compact-spec").toString + "/t"
    mess(dir, batches = 8)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytesPer = Sinks.partitionFiles(fs, new Path(dir))
      .map { case (k, v) => k -> v.map(_._2).sum }
    // target = half of partition a's bytes → expect ceil(bytes/target)
    val target = math.max(1L, bytesPer("part=a") / 2)
    val stats = Sinks.compact(spark, dir, targetBytes = target)
    stats.foreach { st =>
      val expect = math.max(1L, (st.bytesBefore + target - 1) / target)
      assert(st.filesAfter <= math.max(expect, st.filesBefore),
        s"${st.partition}: ${st.filesAfter} files for target $target")
      if (st.filesBefore > expect) assert(st.filesAfter <= expect)
    }
    // rows intact
    assert(spark.read.parquet(dir).count() === 8L * 50)
  }

  test("already-compact partitions are not rewritten") {
    val dir = Files.createTempDirectory("graft-compact-spec").toString + "/t"
    mess(dir, batches = 2)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pathsBefore = Sinks.partitionFiles(fs, new Path(dir))
      .values.flatten.map(_._1.toString).toSet
    // tiny target: every partition is already at/over its file budget
    val stats = Sinks.compact(spark, dir, targetBytes = 1L)
    val pathsAfter = Sinks.partitionFiles(fs, new Path(dir))
      .values.flatten.map(_._1.toString).toSet
    assert(pathsAfter === pathsBefore) // untouched — zero IO
    stats.foreach(st => assert(st.filesAfter === st.filesBefore))
  }

  test("unpartitioned directories compact to the root") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-spec").toString + "/t"
    (0 until 5).foreach { b =>
      (0 until 20).map(i => (b * 20L + i, s"p$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val stats = Sinks.compact(spark, dir, targetBytes = 1L << 30)
    assert(stats.map(_.partition) === Seq(""))
    assert(stats.head.filesBefore === 5L && stats.head.filesAfter === 1L)
    assert(spark.read.parquet(dir).select(sum(col("id"))).head.getLong(0)
      === (0L until 100).sum)
  }
}
