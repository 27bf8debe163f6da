package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Pins the handoff-manifest contract (record → audit) and the
  * replay-safe append: a clean directory audits empty; deletion,
  * foreign files, and in-place rewrites are each named; a re-delivered
  * batch id writes nothing. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-manifest").toString + "/t"

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(dir: String): Seq[Path] = {
    val it = fs(dir).listFiles(new Path(dir), true)
    val buf = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val p = it.next().getPath
      if (!p.toUri.getPath.contains("_graft_manifest") &&
        !p.getName.startsWith("_") && !p.getName.startsWith("."))
        buf += p
    }
    buf.toSeq
  }

  test("manifest rows account for every file and every row") {
    val dir = freshDir()
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    val m = Sinks.manifest(spark, dir).collect()
    assert(m.map(_.getLong(1)).sum == 100)
    assert(m.length == dataFiles(dir).size)
    assert(m.forall(_.getLong(2) > 0))
  }

  test("verifyManifest: clean, missing, unexpected, drift") {
    val dir = freshDir()
    (1 to 60).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(3).write.parquet(dir)
    Sinks.writeManifest(spark, dir)
    assert(Sinks.verifyManifest(spark, dir).isEmpty)

    // a reader-visible foreign file appears → unexpected
    val extraSrc = freshDir()
    Seq((999L, "x")).toDF("id", "v").coalesce(1).write.parquet(extraSrc)
    val extra = dataFiles(extraSrc).head
    fs(dir).rename(extra, new Path(dir, "part-extra.parquet"))
    val afterAdd = Sinks.verifyManifest(spark, dir).collect()
    assert(afterAdd.map(_.getString(1)).toSeq == Seq("unexpected"))

    // remove it and delete a recorded file → missing
    fs(dir).delete(new Path(dir, "part-extra.parquet"), false)
    fs(dir).delete(dataFiles(dir).head, false)
    val afterDel = Sinks.verifyManifest(spark, dir).collect()
    assert(afterDel.map(_.getString(1)).toSeq == Seq("missing"))
  }

  test("vacuum removes orphans, keeps data, refuses corruption") {
    val dir = freshDir()
    (1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(2).write.parquet(dir)
    Sinks.writeManifest(spark, dir)

    val extraSrc = freshDir()
    Seq((7L, "orphan")).toDF("id", "v").coalesce(1).write.parquet(extraSrc)
    fs(dir).rename(dataFiles(extraSrc).head, new Path(dir, "part-orphan.parquet"))

    val dry = Sinks.vacuum(spark, dir, dryRun = true)
    assert(dry.size == 1 && dry.head.endsWith("part-orphan.parquet"))
    assert(fs(dir).exists(new Path(dir, "part-orphan.parquet")))

    val removed = Sinks.vacuum(spark, dir)
    assert(removed == dry)
    assert(!fs(dir).exists(new Path(dir, "part-orphan.parquet")))
    assert(spark.read.parquet(dir).count() == 40)
    assert(Sinks.verifyManifest(spark, dir).isEmpty)

    // a missing recorded file is corruption — vacuum must refuse
    fs(dir).delete(dataFiles(dir).head, false)
    intercept[IllegalArgumentException] { Sinks.vacuum(spark, dir) }
  }

  test("compact refreshes a recorded manifest instead of stranding it") {
    val dir = freshDir()
    val df = (1 to 200).map(i => (i.toLong, "x" * 50)).toDF("id", "v")
    (0 until 6).foreach(_ => df.coalesce(1)
      .write.mode("append").parquet(dir))
    Sinks.writeManifest(spark, dir)
    Sinks.compact(spark, dir, targetBytes = 1L << 30) // 6 files -> 1
    assert(dataFiles(dir).size == 1)
    assert(Sinks.verifyManifest(spark, dir).isEmpty,
      "manifest should be refreshed post-compaction")
  }

  test("idempotentAppend: a re-delivered batch id is a no-op") {
    val dir = freshDir()
    assert(Sinks.idempotentAppend(
      (1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), dir, 7L))
    // replay with DIFFERENT data must not land
    assert(!Sinks.idempotentAppend(
      (1 to 99).map(i => (i.toLong, "b")).toDF("id", "v"), dir, 7L))
    assert(Sinks.idempotentAppend(
      (1 to 5).map(i => (i.toLong, "c")).toDF("id", "v"), dir, 8L))
    val got = spark.read.parquet(dir)
    assert(got.count() == 15)
    assert(got.filter(org.apache.spark.sql.functions.col("batch") === 7)
      .count() == 10)
  }

  test("snapshot time travel: readAt(v) is blind to later appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tt").toString
    import spark.implicits._
    Sinks.idempotentAppend(
      (1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), dir, 0L)
    val v0 = Sinks.snapshotManifest(spark, dir)
    Sinks.idempotentAppend(
      (11 to 25).map(i => (i.toLong, "b")).toDF("id", "v"), dir, 1L)
    val v1 = Sinks.snapshotManifest(spark, dir)
    assert(v0 == 0L && v1 == 1L)
    assert(Sinks.snapshotVersions(spark, dir) == Seq(0L, 1L))
    // v0 sees exactly batch 0 — the later append is invisible
    val at0 = Sinks.readAt(spark, dir, v0)
    assert(at0.count() == 10)
    assert(at0.select("id").as[Long].collect().toSet == (1L to 10L).toSet)
    // the partition column survives the file-pinned scan
    assert(at0.columns.contains("batch"))
    // v1 and the plain read agree
    assert(Sinks.readAt(spark, dir, v1).count() == 25)
    assert(spark.read.parquet(dir).count() == 25)
  }

  test("snapshot horizon: a rewritten file fails the pinned scan loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tt2").toString
    import spark.implicits._
    Sinks.idempotentAppend(
      (1 to 2000).map(i => (i.toLong, "x" * 50)).toDF("id", "v")
        .repartition(4), dir, 0L)
    val v0 = Sinks.snapshotManifest(spark, dir)
    // compact only rewrites when >1 file exists — pin the precondition
    assert(Sinks.manifest(spark, dir).count() > 1)
    // compaction rewrites the files the snapshot recorded
    Sinks.compact(spark, dir, targetBytes = 1L << 30)
    val e = intercept[Exception] {
      Sinks.readAt(spark, dir, v0).count()
    }
    assert(e.getMessage != null)
  }
}
