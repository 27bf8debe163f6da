package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mergeability contracts: CMS merge is exact by linearity (cell-wise
  * sums), HLL merge is exact by register-max — merged per-batch
  * sketches equal the full-scan build BIT-FOR-BIT, and mismatched CMS
  * hash params refuse to merge.
  */
class SketchMergeSpec extends SparkSpec {
  import spark.implicits._

  private val keys = (1 to 300).map(i => s"k${i % 37}") ++
    (1 to 100).map(i => s"only_b$i")

  test("CMS merge ≡ full build, exactly") {
    val df = keys.toDF("key")
    // deterministic hash split into two "batches"
    val left = df.filter(md5($"key").substr(1, 1) < "8")
    val right = df.filter(md5($"key").substr(1, 1) >= "8")
    val full = Sketch.countMin(df, "key")
    val merged = Sketch.mergeCms(
      Sketch.countMin(left, "key"), Sketch.countMin(right, "key"))
    val probes = df.distinct()
    val f = full.estimate(probes, "key").orderBy("key").collect().toSeq
    val m = merged.estimate(probes, "key").orderBy("key").collect().toSeq
    assert(f == m)
  }

  test("grouped CMS: merge ≡ full per group; groups never cross-pollute") {
    val df = keys.zipWithIndex
      .map { case (k, i) => (if (i % 3 == 0) "en" else "de", k) }
      .toDF("lang", "key")
    val left = df.filter(md5($"key").substr(1, 1) < "8")
    val right = df.filter(md5($"key").substr(1, 1) >= "8")
    val full = Sketch.countMinGrouped(df, Seq("lang"), "key")
    val merged = Sketch.mergeCmsGrouped(
      Sketch.countMinGrouped(left, Seq("lang"), "key"),
      Sketch.countMinGrouped(right, Seq("lang"), "key"))
    val probes = df.distinct()
    val f = full.estimate(probes, "key").orderBy("lang", "key").collect().toSeq
    val m = merged.estimate(probes, "key").orderBy("lang", "key").collect().toSeq
    assert(f == m && f.nonEmpty)
    // per-group isolation + upper bound: est >= the group's own exact
    // count for every (lang, key) — a cross-group leak would also
    // show as est inflated beyond the group total, so pin both sides
    val exact = df.groupBy($"lang", $"key").agg(count(lit(1)).as("exact"))
    val joined = full.estimate(probes, "key")
      .join(exact, Seq("lang", "key"))
      .select($"est", $"exact").as[(Long, Long)].collect()
    assert(joined.forall { case (est, ex) => est >= ex })
    // a key present ONLY under one group estimates 0 under the other
    val zero = full.estimate(Seq(("en", "only_under_neither"))
        .toDF("lang", "key"), "key")
      .select($"est").as[Long].head()
    assert(zero == 0L)
  }

  test("grouped CMS param/group mismatches refuse to merge") {
    val df = Seq(("en", "a"), ("de", "b")).toDF("lang", "key")
    val a = Sketch.countMinGrouped(df, Seq("lang"), "key")
    val b = Sketch.countMinGrouped(df, Seq("lang"), "key", width = 32)
    intercept[IllegalArgumentException] { Sketch.mergeCmsGrouped(a, b) }
  }

  test("HLL register merge ≡ full registers, exactly") {
    val df = keys.toDF("key")
    val left = df.filter(md5($"key").substr(1, 1) < "8")
    val right = df.filter(md5($"key").substr(1, 1) >= "8")
    val full = Sketch.hllRegisters(df, "key").orderBy("b").collect().toSeq
    val merged = Sketch.hllRegisters(left, "key")
      .unionByName(Sketch.hllRegisters(right, "key"))
      .groupBy($"b").agg(max($"reg").as("reg"))
      .orderBy("b").collect().toSeq
    assert(full == merged)
    // and hllDistinct is the registers+estimate composition
    val est1 = Sketch.hllDistinct(df, "key").collect().head
    val est2 = Sketch.hllEstimate(Sketch.hllRegisters(df, "key")).collect().head
    assert(est1 == est2)
  }

  test("grouped HLL: cross-group register max ≡ full union registers (the rolling-MAU kernel)") {
    // dau_mau_stickiness's correctness rests on this: the rolling
    // window MAX over per-day register frames must equal the
    // registers of the union of those days — groups are days here
    val df = keys.zipWithIndex
      .map { case (k, i) => (s"d${i % 3}", k) }.toDF("day", "key")
    val perDay = Sketch.hllRegistersGrouped(df, Seq("day"), "key")
    val windowMerged = perDay.groupBy($"b").agg(max($"reg").as("reg"))
      .orderBy("b").collect().toSeq
    val full = Sketch.hllRegisters(df, "key").orderBy("b").collect().toSeq
    assert(windowMerged == full)
    // and the ungrouped form IS the grouped form with no group cols
    val viaGrouped = Sketch.hllRegistersGrouped(df, Nil, "key")
      .orderBy("b").collect().toSeq
    assert(viaGrouped == full)
  }

  test("mismatched CMS params refuse to merge") {
    val df = keys.toDF("key")
    val e = intercept[IllegalArgumentException] {
      Sketch.mergeCms(Sketch.countMin(df, "key", depth = 4, width = 64),
        Sketch.countMin(df, "key", depth = 4, width = 32))
    }
    assert(e.getMessage.contains("matching params"))
  }

  test("Bloom merge (word-wise OR) ≡ full build, bit-for-bit; pruning agrees") {
    val df = keys.toDF("key")
    val left = df.filter(md5($"key").substr(1, 1) < "8")
    val right = df.filter(md5($"key").substr(1, 1) >= "8")
    val bits = 1024
    def words(f: Bloom.Filter): Seq[Long] =
      f.packed.select(col("__graft_bloom_words"))
        .as[Seq[Long]].head()
    val wa = words(Bloom.build(left, "key", bits, 4))
    val wb = words(Bloom.build(right, "key", bits, 4))
    val wf = words(Bloom.build(df, "key", bits, 4))
    val merged = wa.zip(wb).map { case (x, y) => x | y }
    assert(merged == wf)
    // a filter reconstructed from the merged words prunes exactly like
    // the full build: no false negatives on seen keys
    val fullFilter = Bloom.build(df, "key", bits, 4)
    val seen = fullFilter.prune(df.distinct(), "key").count()
    assert(seen == df.distinct().count())
  }
}
