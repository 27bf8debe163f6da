package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench load-detection protocol (VERDICT r9 #1: BENCH_r09 shipped
  * a phantom 6x regression because a 0.652 s floor spike rode inside
  * one query's sweep while the run-median floor and every sweep-median
  * floor stayed in the idle band — no sentinel consulted the per-sweep
  * floor MAX samples already being recorded). Pure math, no Spark. */
class BenchSentinelsSpec extends AnyFunSuite {

  test("planted floor spike inside one sweep gets flagged (BENCH_r09 class)") {
    // run floor median 0.063 (the actual r9 value); dedup_apply_best's
    // sweep caught a 0.652 floor sample while every other sweep stayed
    // idle-band. rep ratio 16.88/9.90 = 1.7 < 3 → rep sentinel silent;
    // sweep floor MEDIAN 0.065 < 0.5 → floor sentinel silent.
    val sweepFloorMax = Map(
      "dedup_apply_best" -> 0.652,
      "q1_agg" -> 0.071,
      "rolling_median" -> 0.058)
    val flagged = BenchSentinels.floorSpikeContaminated(
      sweepFloorMax, runFloorMedian = 0.063)
    assert(flagged == Seq("dedup_apply_best"))
    // and the silent-in-r9 sentinels stay silent on the same evidence,
    // proving the spike detector is the one that catches this class
    assert(BenchSentinels.repContaminated(
      Map("dedup_apply_best" -> ((16.88, 9.90)))).isEmpty)
    assert(BenchSentinels.floorContaminated(
      Map("dedup_apply_best" -> 0.065), bound = 0.5).isEmpty)
  }

  test("idle-band jitter does not flag (absolute guard)") {
    // a fast box idling at 0.03 with samples to 0.1: 0.1 > 3x0.03 but
    // under the 0.15 absolute guard — quiet runs must not self-flag
    val flagged = BenchSentinels.floorSpikeContaminated(
      Map("a" -> 0.10, "b" -> 0.04), runFloorMedian = 0.03)
    assert(flagged.isEmpty)
  }

  test("slow-box relative scaling: bound tracks the run's own floor") {
    // a box idling at 0.09: bound = 3x0.09 = 0.27 > abs 0.15, so a
    // 0.2 sample is that box's OWN normal band, not a spike
    assert(BenchSentinels.floorSpikeBound(0.09) === 0.27)
    assert(BenchSentinels.floorSpikeContaminated(
      Map("a" -> 0.2), runFloorMedian = 0.09).isEmpty)
    assert(BenchSentinels.floorSpikeContaminated(
      Map("a" -> 0.3), runFloorMedian = 0.09) == Seq("a"))
  }

  test("sustained moderate load flags via the floor-median sentinel (BENCH_r10 slip)") {
    // The r10 committed run: run floor median 0.0716; dedup_minhash_lsh
    // sat at sweep floor median 0.132 (1.8x) through its whole sweep
    // and "regressed" 3.1x. The MAX-based spike sentinel's bound was
    // max(3x0.0716, 0.15) = 0.215 — a 0.132 max sample slips under it;
    // the absolute floor sentinel's 0.5 bound is far away. The
    // floor-median sentinel (bound max(1.5x0.0716, 0.1) = 0.107)
    // catches exactly this class.
    val sweepFloorMed = Map(
      "dedup_minhash_lsh" -> 0.132,
      "graph_pagerank" -> 0.128,
      "resume_incremental" -> 0.122,
      "q1_agg" -> 0.070)
    assert(BenchSentinels.floorMedRelContaminated(
      sweepFloorMed, runFloorMedian = 0.0716) ==
      Seq("dedup_minhash_lsh", "graph_pagerank", "resume_incremental"))
    // proof this is the slip class: the r10-era sentinels stay silent
    // on the same evidence
    assert(BenchSentinels.floorSpikeContaminated(
      Map("dedup_minhash_lsh" -> 0.132), runFloorMedian = 0.0716).isEmpty)
    assert(BenchSentinels.floorContaminated(sweepFloorMed, bound = 0.5).isEmpty)
  }

  test("floor-median sentinel does not flag quiet-box jitter") {
    // quiet box at run floor median 0.039: bound = max(0.0585, 0.1) =
    // 0.1 — the idle band (0.03..0.07 medians) stays silent even when
    // a sweep's MEDIAN drifts to 2x the run median, because a median
    // under 0.1 s cannot hide a regression-sized inflation
    assert(BenchSentinels.floorMedRelContaminated(
      Map("a" -> 0.07, "b" -> 0.04), runFloorMedian = 0.039).isEmpty)
    assert(BenchSentinels.floorMedRelBound(0.039) === 0.1)
  }

  test("rep sentinel still owns the transient-spike class") {
    assert(BenchSentinels.repContaminated(
      Map("x" -> ((3.1, 1.0)), "y" -> ((2.9, 1.0)))) == Seq("x"))
  }

  test("floor sentinel still owns the sustained-load class") {
    assert(BenchSentinels.floorContaminated(
      Map("x" -> 0.6, "y" -> 0.4), bound = 0.5) == Seq("x"))
  }

  test("resolveOutPath never clobbers a committed artifact (VERDICT r12 #7)") {
    val clock = () => 1755230000123L
    // explicit env always wins, full or filtered, existing or not
    assert(BenchSentinels.resolveOutPath(Some("BENCH.json"), only = false,
      _ => true, clock) == "BENCH.json")
    assert(BenchSentinels.resolveOutPath(Some("BENCH.json"), only = true,
      _ => false, clock) == "BENCH.json")
    // ONLY-filtered dev runs keep the scratch default (r11 rule)
    assert(BenchSentinels.resolveOutPath(None, only = true,
      _ => true, clock) == "bench_partial.json")
    // full run, no committed artifact yet → the canonical name
    assert(BenchSentinels.resolveOutPath(None, only = false,
      _ => false, clock) == "bench_round.json")
    // full run, bench_round.json already committed → divert, timestamped
    assert(BenchSentinels.resolveOutPath(None, only = false,
      p => p == "bench_round.json", clock)
      == "bench_round.1755230000123.json")
  }
}
