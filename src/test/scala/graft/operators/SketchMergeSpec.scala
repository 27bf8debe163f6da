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
