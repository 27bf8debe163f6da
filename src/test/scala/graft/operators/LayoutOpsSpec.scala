package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes the filter") {
    val keys = (1L to 500L).toDF("k")
    val bf = Bloom.build(keys, "k", bits = 1 << 12, hashes = 4)
    assert(bf.prune(keys, "k").count() == 500)
  }

  test("false-positive rate stays near the analytic bound") {
    val keys = (1L to 500L).toDF("k")
    val bf = Bloom.build(keys, "k", bits = 1 << 12, hashes = 4)
    val absent = (10001L to 12000L).toDF("k")
    val fp = bf.prune(absent, "k").count()
    // (1 - e^(-kn/m))^k with n=500, m=4096, k=4 → ~0.024; allow 3×
    assert(fp <= (2000 * 0.024 * 3).toInt, s"fp=$fp of 2000")
  }

  test("prune + exact verify equals the plain semi-join") {
    val dim = (1L to 100L).filter(_ % 3 == 0).toDF("k")
    val fact = (1L to 1000L).map(i => (i % 150, i)).toDF("k", "v")
    val bf = Bloom.build(dim, "k", bits = 1 << 10, hashes = 4)
    val got = bf.prune(fact, "k").join(dim, Seq("k")).as[(Long, Long)].collect().toSet
    val want = fact.join(dim, Seq("k")).as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("parameter guards reject bad bits/hashes") {
    val keys = Seq(1L).toDF("k")
    intercept[IllegalArgumentException](Bloom.build(keys, "k", bits = 100))
    intercept[IllegalArgumentException](Bloom.build(keys, "k", hashes = 9))
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 2000L).map(i => (i, s"doc$i")).toDF("id", "t")

  test("bernoulli membership is deterministic and partition-independent") {
    val a = Sampling.bernoulli(docs, "id", 2000).select("id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs.repartition(13), "id", 2000)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // ~20% with hash variance; md5 is uniform so ±5pp is generous
    assert(a.size > 2000 * 0.15 && a.size < 2000 * 0.25, s"kept ${a.size}")
  }

  test("split is exhaustive, disjoint, and consistent with bernoulli") {
    val s = Sampling.splitLabel(docs, "id", 2000)
    val test_ = s.filter(col("split") === "test").select("id").as[Long].collect().toSet
    val train = s.filter(col("split") === "train").select("id").as[Long].collect().toSet
    assert(test_.size + train.size == 2000 && (test_ & train).isEmpty)
    assert(test_ == Sampling.bernoulli(docs, "id", 2000).select("id").as[Long].collect().toSet)
  }

  test("stratifiedK takes exactly min(k, |stratum|) per stratum, deterministically") {
    val strat = (1L to 100L).map(i => (s"g${i % 3}", i)) ++ Seq(("tiny", 999L))
    val df = strat.toDF("g", "id")
    val out = Sampling.stratifiedK(df, Seq("g"), "id", 5)
    val sizes = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("g0" -> 5L, "g1" -> 5L, "g2" -> 5L, "tiny" -> 1L))
    val again = Sampling.stratifiedK(df.repartition(7), Seq("g"), "id", 5)
    assert(out.collect().toSet == again.collect().toSet)
  }
}

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 0L, false), (2L, "b", 0L, false), (3L, "c", 0L, false))
    .toDF("k", "v", "version", "deleted")

  test("upsert applies updates, inserts, and deletes") {
    val changes = Seq(
      (2L, "B", 1L, false),  // update
      (3L, "c", 1L, true),   // delete
      (4L, "d", 1L, false))  // insert
      .toDF("k", "v", "version", "deleted")
    val out = Merge.upsert(base, changes, Seq("k"), "version", "deleted")
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("equal version: the change row wins (idempotent re-apply)") {
    val changes = Seq((1L, "A", 0L, false)).toDF("k", "v", "version", "deleted")
    val once = Merge.upsert(base, changes, Seq("k"), "version", "deleted")
    val twice = Merge.upsert(once
        .withColumn("version", col("version")).select(base.columns.map(col): _*),
      changes, Seq("k"), "version", "deleted")
    assert(once.select("k", "v").collect().toSet == twice.select("k", "v").collect().toSet)
    assert(once.filter(col("k") === 1 && col("v") === "A").count() == 1)
  }

  test("schema mismatch is rejected") {
    val bad = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException](
      Merge.upsert(base, bad, Seq("k"), "version", "deleted"))
  }
}

class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")

  // per-key op chains: update→delete (2), delete→re-insert (3),
  // update→update (4), plus a fresh insert (5)
  private val log = Seq(
    (2L, "B", 1L, "U"), (2L, "", 2L, "D"),
    (3L, "", 1L, "D"), (3L, "C2", 3L, "I"),
    (4L, "D1", 1L, "U"), (4L, "D2", 2L, "U"),
    (5L, "e", 1L, "I")).toDF("k", "v", "seq", "op")

  private def state(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().toSet

  test("the final op per key decides: delete, resurrect, last update, insert") {
    val out = state(Merge.cdcApply(snapshot, log, Seq("k"), "seq", "op"))
    assert(out == Set((1L, "a"), (3L, "C2"), (4L, "D2"), (5L, "e")))
  }

  test("re-applying the same log is idempotent") {
    val once = Merge.cdcApply(snapshot, log, Seq("k"), "seq", "op")
    val twice = Merge.cdcApply(once, log, Seq("k"), "seq", "op")
    assert(state(once) == state(twice))
  }

  test("log schema must be snapshot ++ (seq, op)") {
    val bad = Seq((1L, "x", 1L)).toDF("k", "v", "seq")
    intercept[IllegalArgumentException](
      Merge.cdcApply(snapshot, bad, Seq("k"), "seq", "op"))
  }

  test("narrow (int) sequence column works under ANSI — null sentinel, no cast overflow") {
    val log = Seq((2L, "B", 1, "U"), (5L, "e", 1, "I")).toDF("k", "v", "seq", "op")
    val out = state(Merge.cdcApply(snapshot, log, Seq("k"), "seq", "op"))
    assert(out == Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d"), (5L, "e")))
  }
}

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    (1L, "a", 0L), (1L, "b", 2L), (1L, "b", 3L), (1L, "c", 5L), // b@3 no-op
    (2L, "x", 1L))                                              // single-version key
    .toDF("k", "v", "version")

  test("scd2 compresses no-op changes and closes intervals with lead") {
    val hist = Merge.scd2(log, Seq("k"), "version")
      .select("k", "v", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(hist == Set(
      (1L, "a", 0L, Some(2L)), (1L, "b", 2L, Some(5L)), (1L, "c", 5L, None),
      (2L, "x", 1L, None)))
  }

  test("exactly one current (valid_to IS NULL) row per key") {
    val cur = Merge.scd2(log, Seq("k"), "version")
      .filter(col("valid_to").isNull).groupBy(col("k")).count()
      .as[(Long, Long)].collect().toMap
    assert(cur == Map(1L -> 1L, 2L -> 1L))
  }

  test("scd2Apply is idempotent under re-delivered change batches") {
    val hist0 = Merge.scd2(log, Seq("k"), "version")
    val batch = Seq((1L, "d", 7L), (2L, "x", 4L), (3L, "n", 1L)) // new / no-op / insert
      .toDF("k", "v", "version")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "valid_from", "valid_to")
        .as[(Long, String, Long, Option[Long])].collect().toSet
    val once = Merge.scd2Apply(hist0, batch, Seq("k"), "version")
    val twice = Merge.scd2Apply(once, batch, Seq("k"), "version")
    assert(canon(once) == canon(twice))
    assert(canon(once).contains((1L, "d", 7L, None)))
    assert(canon(once).contains((3L, "n", 1L, None)))
    // the no-op re-delivery did not split key 2's history
    assert(canon(once).count(_._1 == 2L) == 1)
  }

  test("payload-less or reserved-column input is rejected") {
    intercept[IllegalArgumentException](
      Merge.scd2(Seq((1L, 0L)).toDF("k", "version"), Seq("k"), "version"))
    intercept[IllegalArgumentException](
      Merge.scd2(Seq((1L, "a", 0L, 9L)).toDF("k", "v", "version", "valid_from"),
        Seq("k"), "version"))
  }
}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def naiveZ(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("zvalue2 matches the per-bit reference on a grid") {
    val grid = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue2(col("a"), col("b"), 5).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == naiveZ(a, b, 5), s"($a,$b)") }
  }

  test("file stats bound both dimensions within each z-bucket") {
    val rows = (0L until 4096L).map(i => (i % 64, (i * 7) % 64)).toDF("x", "y")
    val stats = ZOrder.fileStats(rows, "x", "y", bits = 6, nBuckets = 16)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.map(_._2).sum == 4096)
    // 16 buckets = a fixed 4-bit z prefix = the top 2 bits of BOTH
    // dims fixed → each dim confined to a 16-wide range per bucket
    stats.foreach { case (bucket, _, minA, maxA, minB, maxB) =>
      assert(maxA - minA <= 15 && maxB - minB <= 15,
        s"bucket $bucket spans a=[$minA,$maxA] b=[$minB,$maxB]")
    }
  }

  test("bucket count guard rejects non-dividing nBuckets") {
    val rows = Seq((1L, 1L)).toDF("x", "y")
    intercept[IllegalArgumentException](
      ZOrder.fileStats(rows, "x", "y", bits = 5, nBuckets = 3))
  }
}

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("hilbert index is a bijection onto [0, 4^bits) with unit-step locality") {
    // the property Z-order does NOT have: consecutive indexes are
    // always Manhattan-adjacent cells, so every contiguous range is
    // one connected region
    val bits = 4
    val grid = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.hilbertIndex2(col("a"), col("b"), bits).as("h"))
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._3).sorted.toSeq == (0L until 256L).toSeq,
      "indexes must be a permutation of the full grid")
    val byD = got.sortBy(_._3)
    byD.sliding(2).foreach { case Array((a1, b1, d1), (a2, b2, _)) =>
      val manhattan = math.abs(a2 - a1) + math.abs(b2 - b1)
      assert(manhattan == 1, s"jump of $manhattan after d=$d1 ($a1,$b1)->($a2,$b2)")
    }
  }

  test("codegen and interpreted eval agree; negatives mask like pmod") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.functions.expr.HilbertIndex(Literal(11L), Literal(14L), 4)
    val interpreted = e.eval(null).asInstanceOf[Long]
    val viaPlan = Seq((11L, 14L)).toDF("a", "b")
      .select(ZOrder.hilbertIndex2(col("a"), col("b"), 4).as("h"))
      .as[Long].head()
    assert(interpreted == viaPlan)
  }

  test("hilbert buckets stay tighter than z-order at the power-of-two seam") {
    // sanity: stats shape matches fileStats and every bucket is a
    // contiguous d-range whose cells bound both dims
    val rows = (0L until 4096L).map(i => (i % 64, (i * 7) % 64)).toDF("x", "y")
    val stats = ZOrder.hilbertStats(rows, "x", "y", bits = 6, nBuckets = 16)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.map(_._2).sum == 4096)
    stats.foreach { case (bucket, _, minA, maxA, minB, maxB) =>
      // a 256-cell Hilbert segment fits in a bounded window on each
      // axis (size <= 31 for any aligned 16x16-equivalent segment)
      assert(maxA - minA <= 31 && maxB - minB <= 31,
        s"bucket $bucket spans a=[$minA,$maxA] b=[$minB,$maxB]")
    }
  }
}

class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Rows the parquet readers actually emitted (post row-group
    * pruning), summed over every scan in the executed plan —
    * descending through AQE's final plan. */
  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(f.metrics("numOutputRows").value)
      case o => o.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).sum
  }

  test("z-ordered layout prunes row groups for range predicates on BOTH dims") {
    // uniform 40k-row grid over (a, b) in [0, 1024)²; the unordered
    // copy shuffles rows randomly so every file spans the full range
    val data = (0L until 40000L)
      .map(i => (i, (i * 48271) % 1024, (i * 16807) % 1024))
      .toDF("id", "a", "b")
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    data.repartition(16).write.mode("overwrite").parquet(s"$tmp/plain")
    ZOrder.layoutParquet(data, "a", "b", bits = 10, nFiles = 16, s"$tmp/zed")

    def q(path: String, c: String) =
      spark.read.parquet(path).filter(col(c).between(100, 200))

    // identical answers first — layout must not change content
    assert(q(s"$tmp/zed", "a").count() == q(s"$tmp/plain", "a").count())
    assert(q(s"$tmp/zed", "b").count() == q(s"$tmp/plain", "b").count())

    // the measured pruning claim: the plain copy's footer stats prune
    // nothing (every file spans [0,1024)), the z-ordered copy reads
    // only the z-ranges whose min/max overlap [100,200] — on either dim
    val plainA = scannedRows(q(s"$tmp/plain", "a"))
    val zedA = scannedRows(q(s"$tmp/zed", "a"))
    val plainB = scannedRows(q(s"$tmp/plain", "b"))
    val zedB = scannedRows(q(s"$tmp/zed", "b"))
    assert(plainA == 40000L, s"plain copy unexpectedly pruned: $plainA")
    assert(zedA <= plainA / 2, s"a-predicate read $zedA of $plainA rows")
    assert(zedB <= plainB / 2, s"b-predicate read $zedB of $plainB rows")
  }
}
