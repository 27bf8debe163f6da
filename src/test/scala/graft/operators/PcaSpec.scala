package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("power iteration recovers a planted dominant direction") {
    // 40 vectors hugging the e1 axis + small noise on other dims:
    // the dominant singular direction is ±e1
    val rows = (0 until 40).map { i =>
      Array(10.0f + (i % 5), 0.1f * (i % 3) - 0.1f, 0.05f * (i % 2), 0.0f)
    }
    val df = rows.toDF("embedding")
    val out = Pca.powerIteration(df, "embedding", dims = 4, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1)) > 0.99, s"e1 loading ${out(1)}")
    assert((2 to 4).forall(d => math.abs(out(d)) < 0.1), out.toString)
  }

  test("the iterate is a unit vector and ev estimates the Rayleigh growth") {
    val rows = (0 until 40).map { i =>
      Array(10.0f + (i % 5), 0.1f * (i % 3) - 0.1f, 0.05f * (i % 2), 0.0f)
    }
    val df = rows.toDF("embedding")
    val out = Pca.powerIteration(df, "embedding", dims = 4, iters = 2).collect()
    val norm2 = out.map(r => r.getDouble(1) * r.getDouble(1)).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"norm² $norm2")
    // ev = ‖A^T A v‖ with ‖v‖=1 and v ≈ the dominant direction: it
    // must sit between the mean and the max squared row norm scaled
    // by n — loose but direction-independent sanity bounds
    val ev = out.head.getDouble(2)
    val sq = rows.map(v => v.map(x => x.toDouble * x).sum)
    assert(ev >= sq.min && ev <= sq.sum, s"ev $ev outside [${sq.min}, ${sq.sum}]")
  }

  test("iteration count sharpens, never flips, the planted direction") {
    val rows = (0 until 40).map { i =>
      Array(10.0f + (i % 5), 2.0f * (i % 3) - 2.0f, 0.05f * (i % 2), 0.0f)
    }
    val df = rows.toDF("embedding")
    def e1(iters: Int): Double =
      Pca.powerIteration(df, "embedding", dims = 4, iters = iters)
        .filter(col("dim") === 1).collect().head.getDouble(1)
    val (a, b) = (e1(1), e1(3))
    assert(a > 0 && b > 0)
    assert(b >= a - 1e-6, s"iter1 $a, iter3 $b")
  }
}
