package graft.operators

import graft.SparkSpec

/** Margin-based bitext mining: mutual-best + margin semantics on
  * planted 2-D pools (one plane, everything in one bucket, so the
  * test exercises the mining, not the bucketing). */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def pool(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  // single positive plane — all vectors share a bucket
  private def planes = pool(0L -> Array(1f, 1f))

  test("mutual-best pairs are mined; an asymmetric best is not") {
    // y1 is x1's best and x1 is y1's best; x2's best is y1 too, but
    // y1's best is x1 — so (x2, y1) must NOT be mined
    val x = pool(10L -> Array(1f, 0f), 12L -> Array(0.95f, 0.312f))
    val y = pool(11L -> Array(0.99f, 0.141f))
    val out = Ann.bitextMine(x, y, planes, kNbhd = 4, minMargin = 0.0)
      .select($"x_id", $"y_id").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 11L)))
  }

  test("two clean pairs both mined with margin > 1; threshold gates them off") {
    // two near-orthogonal planted pairs: each side's neighborhood mean
    // is dragged down by the far candidate, so the true pair's margin
    // clears 1
    val x = pool(10L -> Array(1f, 0.05f), 12L -> Array(0.05f, 1f))
    val y = pool(11L -> Array(0.995f, 0.1f), 13L -> Array(0.1f, 0.995f))
    val mined = Ann.bitextMine(x, y, planes, kNbhd = 4, minMargin = 1.0)
      .select($"x_id", $"y_id", $"margin")
      .as[(Long, Long, Double)].collect().toSet
    assert(mined.map(t => (t._1, t._2)) == Set((10L, 11L), (12L, 13L)))
    assert(mined.forall(_._3 > 1.0))
    val gated = Ann.bitextMine(x, y, planes, kNbhd = 4, minMargin = 99.0)
    assert(gated.count() == 0)
  }
}
