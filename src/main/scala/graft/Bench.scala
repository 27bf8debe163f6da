package graft
import org.apache.spark.sql.SparkSession

/** Pure sentinel math for [[Bench]], factored out so the
  * load-detection protocol is unit-testable without running a bench
  * (VERDICT r9 #1: a planted floor spike must provably get flagged).
  *
  * Three independent detectors, each catching a load shape the others
  * miss:
  *   - rep contamination (median/min > 3): TRANSIENT spikes inside a
  *     sweep — the median absorbed them, compare the min.
  *   - floor contamination (sweep floor median > absolute bound):
  *     SUSTAINED heavy load across a whole sweep — median AND min are
  *     inflated.
  *   - floor SPIKE contamination (any sweep floor sample above
  *     max(rel × run-median floor, abs)): the BENCH_r09 class — a
  *     0.652 s floor sample rode inside one query's sweep while the
  *     run median floor (0.063) and every sweep-median stayed under
  *     the absolute bound, so the query's 6× median inflation shipped
  *     as a phantom regression with every sentinel silent. Relative to
  *     the run's own floor so a fast box flags what its own baseline
  *     calls a spike; the absolute guard keeps idle-band jitter
  *     (0.03 → 0.1) from flagging a quiet run.
  */
object BenchSentinels {
  def repContaminated(medMin: Map[String, (Double, Double)]): Seq[String] =
    medMin.collect {
      case (n, (med, mn)) if mn > 0 && med / mn > 3.0 => n
    }.toSeq.sorted

  def floorContaminated(sweepFloorMed: Map[String, Double],
                        bound: Double): Seq[String] =
    sweepFloorMed.collect { case (n, f) if f > bound => n }.toSeq.sorted

  def floorSpikeBound(runFloorMedian: Double, rel: Double = 3.0,
                      abs: Double = 0.15): Double =
    math.max(rel * runFloorMedian, abs)

  def floorSpikeContaminated(sweepFloorMax: Map[String, Double],
                             runFloorMedian: Double, rel: Double = 3.0,
                             abs: Double = 0.15): Seq[String] = {
    val bound = floorSpikeBound(runFloorMedian, rel, abs)
    sweepFloorMax.collect { case (n, f) if f > bound => n }.toSeq.sorted
  }

  /** Relative floor-MEDIAN sentinel (VERDICT r10 #1a): flag any query
    * whose sweep-local floor median sits past `rel`× the run's own
    * floor median. The r10 committed run proved the MAX-based spike
    * sentinel's 0.15 s absolute bound misses sustained moderate load —
    * five queries sat at 1.7–2.3× the run floor median (0.122–0.133 s
    * vs 0.0716), "regressed" 1.6–3.1×, and all but one shipped with
    * every sentinel silent. A sweep floor MEDIAN is jitter-robust (one
    * stray sample cannot move the median of 3–5), so its absolute
    * guard can sit far lower (default 0.1 s) than the max-sample
    * guard's 0.15 without flagging quiet-box idle jitter. */
  def floorMedRelBound(runFloorMedian: Double, rel: Double = 1.5,
                       abs: Double = 0.1): Double =
    math.max(rel * runFloorMedian, abs)

  def floorMedRelContaminated(sweepFloorMed: Map[String, Double],
                              runFloorMedian: Double, rel: Double = 1.5,
                              abs: Double = 0.1): Seq[String] = {
    val bound = floorMedRelBound(runFloorMedian, rel, abs)
    sweepFloorMed.collect { case (n, f) if f > bound => n }.toSeq.sorted
  }

  /** Artifact-path resolution (VERDICT r12 #2/#7): an explicit
    * SPARK_GRAFT_BENCH_OUT always wins; a filtered (ONLY) run defaults
    * to the dev scratch file bench_partial.json; a FULL run defaults to
    * bench_round.json ONLY when no committed artifact is present —
    * otherwise it diverts to bench_round.<epochMs>.json so an
    * unattended full run (the driver's own, two rounds running) can
    * never silently clobber the recorded round artifact. Pure —
    * existence and clock are injected — so the rule is spec-testable. */
  def resolveOutPath(envOut: Option[String], only: Boolean,
                     exists: String => Boolean,
                     epochMs: () => Long): String =
    envOut.getOrElse {
      if (only) "bench_partial.json"
      else if (!exists("bench_round.json")) "bench_round.json"
      else s"bench_round.${epochMs()}.json"
    }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query repetitions; the MEDIAN is reported. Single samples on
    // a loaded box swing up to ±4× on multi-job queries (VERDICT r2
    // measured it), which makes per-query regression gating
    // meaningless — the median of 3 is stable to ~±20%.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // Load sentinel threshold (seconds): the floor query is a fixed
    // ~10ms scheduler round-trip; a floor median past this bound means
    // the box is under external load and the medians are untrustworthy
    // (BENCH_r04 recorded phantom 8–12× regressions exactly this way).
    val floorBound = sys.env.getOrElse("SPARK_GRAFT_FLOOR_BOUND", "0.5").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions) // same surface Verify runs
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query SHUFFLE accounting: seconds are box-dependent (floor
    // drift forced three rounds of cross-box adjudication); shuffle
    // bytes written are a property of the PLAN — the box-independent
    // scale metric. A listener accumulates stage totals; snapshots
    // bracket each rep OUTSIDE the timer, with the async bus drained
    // so the delta is consistent. OPT-IN (SPARK_GRAFT_BENCH_SHUFFLE=1):
    // the listener costs a uniform ~11% wall overhead (measured
    // final3 vs final4, round 8), so the default TIMING path stays
    // listener-free and comparable across rounds; the shuffle profile
    // is recorded in its own pass (bench_shuffle.json).
    val captureShuffle = sys.env.get("SPARK_GRAFT_BENCH_SHUFFLE").contains("1")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    if (captureShuffle) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            spillBytes.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    def shuffleSnapshot(): (Long, Long) =
      if (!captureShuffle) (0L, 0L)
      else {
        org.apache.spark.GraftCoreBridge.drainListeners(spark.sparkContext)
        (shuffleBytes.get(), spillBytes.get())
      }
    // JIT/codegen/file-listing warmup so the first timed query isn't
    // charged for JVM startup.
    try SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // no stranded caches between queries
      graft.plans.DimRegistry.clear(); graft.plans.MvRegistry.clear() // a declared dim must not speed up the NEXT query
      dt
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Fixed-overhead floor: an empty 1-row job timed before each rep
    // sweep. Its cost is pure scheduler/JVM overhead, independent of
    // the queries — so any inflation measures EXTERNAL machine load,
    // not graft regressions.
    def floorOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(1).count()
      (System.nanoTime() - t0) / 1e9
    }
    floorOnce() // warm the floor path itself
    // dev-only: SPARK_GRAFT_ONLY="a,b" restricts the bench for fast
    // iteration (same knob as Verify); the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // One query's rep sweep: times + the floor sample taken before
    // each rep (a floor sample per REP, not per sweep — BENCH_r05
    // proved the sweep-level floor median can pass while transient
    // load spikes land inside individual queries' rep sweeps) + the
    // last rep's shuffle/spill deltas.
    final case class Sweep(times: Seq[Double], sweepFloors: Seq[Double],
                           shuffleMb: Double, spillMb: Double) {
      def med: Double = median(times)
      def mn: Double = times.min
      def floorMed: Double = median(sweepFloors)
      def floorMax: Double = sweepFloors.max
    }
    def runSweep(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                 n: Int): Sweep = {
      val sweepFloors = scala.collection.mutable.ArrayBuffer[Double]()
      var lastShuffleMb = 0.0
      var lastSpillMb = 0.0
      val times = (1 to n).map { _ =>
        val f = floorOnce(); sweepFloors += f
        val (sh0, sp0) = shuffleSnapshot()
        val dt = timeOnce(fn)
        val (sh1, sp1) = shuffleSnapshot()
        lastShuffleMb = (sh1 - sh0) / 1e6
        lastSpillMb = (sp1 - sp0) / 1e6
        dt
      }
      Sweep(times, sweepFloors.toSeq, lastShuffleMb, lastSpillMb)
    }
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Per-QUERY floor attribution: rep_contaminated (median/min > 3)
    // only catches TRANSIENT spikes — when external load is sustained
    // across ALL of one query's reps, median/min stays ~1 and the query
    // reads as a phantom regression (BENCH_r07 logged four such 10x
    // phantoms with rep_contaminated silent). The floor samples taken
    // inside each query's own sweep attribute the load to that query:
    // its sweep-local floor median past floor_bound marks the timing
    // untrustworthy even when the rep ratio is clean.
    //
    // CPU yardstick (round 12): the floor query measures SCHEDULING
    // latency, which misses a uniformly slower box — round 12's box
    // ran stable queries 1.3-2.2× over the r11 record at NORMAL
    // floors. cpu_ref is a fixed CPU-bound workload (8M md5+crc32
    // folds over 8 fixed partitions, median of 3); cross-round
    // adjudicators divide per-query ratios by cpu_ref_new/cpu_ref_old
    // before logging regressions (tools/bench_diff.py does this when
    // both artifacts carry the field).
    def cpuRefOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 8000000L, 1, 8)
        .selectExpr("sum(crc32(cast(md5(cast(id as string)) as binary))) as s")
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    cpuRefOnce() // warm the codegen path before sampling
    // Sampled TWICE (ADVICE r12): once before the first pass and once
    // after the final sweep — a box that slows down MID-RUN (the exact
    // r12 scenario) shows up as cpu_ref_post >> cpu_ref, so an
    // adjudicator normalizing by a stale pre-run reference can detect
    // the drift instead of mislabeling it a regression.
    val cpuRef = median(Seq.fill(3)(cpuRefOnce()))
    val firstPass: Map[String, Sweep] =
      selected.map { case (name, fn) => name -> runSweep(fn, reps) }.toMap
    val spikeRel = sys.env.getOrElse("SPARK_GRAFT_FLOOR_SPIKE_REL", "3.0").toDouble
    val spikeAbs = sys.env.getOrElse("SPARK_GRAFT_FLOOR_SPIKE_ABS", "0.15").toDouble
    val medRel = sys.env.getOrElse("SPARK_GRAFT_FLOOR_MED_REL", "1.5").toDouble
    val medAbs = sys.env.getOrElse("SPARK_GRAFT_FLOOR_MED_ABS", "0.1").toDouble
    // All four per-query load sentinels over a result set. runFloorMed
    // is the median over EVERY floor sample in the set — the run's own
    // baseline the relative bounds scale from.
    def sentinels(rs: Map[String, Sweep]):
        (Double, Seq[String], Seq[String], Seq[String], Seq[String]) = {
      val allFloors = rs.values.flatMap(_.sweepFloors).toSeq
      val runFloorMed = if (allFloors.nonEmpty) median(allFloors) else 0.0
      val rep = BenchSentinels.repContaminated(
        rs.map { case (n, s) => n -> ((s.med, s.mn)) })
      val fc = BenchSentinels.floorContaminated(
        rs.map { case (n, s) => n -> s.floorMed }, floorBound)
      // per-query floor SPIKE attribution (BENCH_r09's phantom class):
      // any floor sample inside a query's sweep far above the run's
      // own median floor marks that query's MEDIAN untrustworthy even
      // when rep ratio and sweep-median floor are clean
      val spike = BenchSentinels.floorSpikeContaminated(
        rs.map { case (n, s) => n -> s.floorMax }, runFloorMed,
        spikeRel, spikeAbs)
      // sustained-moderate-load sentinel (VERDICT r10 #1a): sweep
      // floor MEDIAN past 1.5x the run floor median
      val medRelC = BenchSentinels.floorMedRelContaminated(
        rs.map { case (n, s) => n -> s.floorMed }, runFloorMed,
        medRel, medAbs)
      (runFloorMed, rep, fc, spike, medRelC)
    }
    // Auto re-bench (VERDICT r10 #1b): every query any sentinel
    // flagged is re-run SOLO (reps=5 by default) and its entry
    // replaced, so transient external load self-heals instead of
    // shipping phantom regressions the judge must adjudicate by hand.
    // Sentinels are then re-derived over the final set — a box still
    // loaded during the re-run stays flagged (the artifact refuses to
    // look clean), it is never silently blessed.
    val rebenchReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REBENCH_REPS", "5")
      .toInt.max(1)
    val rebenchOn = !sys.env.get("SPARK_GRAFT_BENCH_REBENCH").contains("0")
    // floorFirstPass is emitted as floor_firstpass (ADVICE r11): after
    // auto re-bench the run floor is recomputed over the UNION of
    // first-pass and quiet solo samples, which dilutes a loaded first
    // pass — the first-pass median is the measurement condition the
    // UNFLAGGED entries' medians were taken under, so record it.
    val (floorFirstPass, rep1, fc1, spike1, medRel1) = sentinels(firstPass)
    val flagged = (rep1 ++ fc1 ++ spike1 ++ medRel1).distinct.sorted
    val rebenched = if (rebenchOn) flagged else Seq.empty[String]
    val results: Map[String, Sweep] =
      if (rebenched.isEmpty) firstPass
      else {
        System.err.println(s"INFO: re-benching ${rebenched.size} sentinel-" +
          s"flagged queries solo at reps=$rebenchReps: ${rebenched.mkString(", ")}")
        firstPass ++ rebenched.map(n => n -> runSweep(selected(n), rebenchReps))
      }
    // post-run cpu_ref sample — see the pre-run comment (ADVICE r12)
    val cpuRefPost = median(Seq.fill(3)(cpuRefOnce()))
    val allFloors = results.values.flatMap(_.sweepFloors).toSeq
    val floorMed = if (allFloors.nonEmpty) median(allFloors) else 0.0
    val floorMax = if (allFloors.nonEmpty) allFloors.max else 0.0
    val loadContaminated = floorMed > floorBound
    val (_, repContaminated, floorContaminated, floorSpikeContaminated,
      floorMedRelContaminated) = sentinels(results)
    def r3(x: Double): String = f"$x%.3f" // keep the long line compact
    val qs = results.map { case (k, s) => s"\"" + k + "\":" + s.med }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, s) => s"\"" + k + "\":" + s.mn }
      .mkString("{", ",", "}")
    val qsFloor = results.map { case (k, s) => s"\"" + k + "\":" + r3(s.floorMed) }
      .mkString("{", ",", "}")
    // per-query floor MAX: the raw evidence the spike sentinel judges,
    // recorded so a cross-box adjudicator can re-derive the flag set
    val qsFloorMax = results.map { case (k, s) => s"\"" + k + "\":" + r3(s.floorMax) }
      .mkString("{", ",", "}")
    val qsShuffle = results.map { case (k, s) => s"\"" + k + "\":" + f"${s.shuffleMb}%.3f" }
      .mkString("{", ",", "}")
    val shuffleTotal = f"${results.values.map(_.shuffleMb).sum}%.1f"
    val spillTotal = f"${results.values.map(_.spillMb).sum}%.1f"
    val shuffleTrailer = if (captureShuffle)
      s""","shuffle_mb":$shuffleTotal,"spill_mb":$spillTotal"""
    else ""
    val shuffleField = if (captureShuffle)
      s""","queries_shuffle_mb":$qsShuffle,"shuffle_mb":$shuffleTotal,"spill_mb":$spillTotal"""
    else ""
    def jarr(xs: Seq[String]): String =
      xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flagged1 = jarr(repContaminated)
    val floorFlagged = jarr(floorContaminated)
    val spikeFlagged = jarr(floorSpikeContaminated)
    val medRelFlagged = jarr(floorMedRelContaminated)
    val rebenchedArr = jarr(rebenched)
    val spikeBound = BenchSentinels.floorSpikeBound(floorMed, spikeRel, spikeAbs)
    val medRelBound = BenchSentinels.floorMedRelBound(floorMed, medRel, medAbs)
    val total = if (results.nonEmpty) results.values.map(_.med).sum else 0.0
    // Subset runs must be self-identifying: a dev artifact produced
    // under SPARK_GRAFT_ONLY silently undercounts "total" otherwise
    // (ADVICE r6). skipped = queries excluded by the filter.
    val onlyField = only match {
      case Some(names) =>
        val skipped = SparkEntry.queries.size - results.size
        s""","only":true,"only_keys":${names.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"skipped":$skipped"""
      case None => ""
    }
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qsMin,"queries_floor":$qsFloor,"queries_floor_max":$qsFloorMax,"sf":"$sfDir","reps":$reps,"agg":"median","floor":$floorMed,"floor_max":$floorMax,"floor_bound":$floorBound,"load_contaminated":$loadContaminated,"rep_contaminated":$flagged1,"floor_contaminated":$floorFlagged,"floor_spike_bound":${r3(spikeBound)},"floor_spike_contaminated":$spikeFlagged,"floor_med_rel_bound":${r3(medRelBound)},"floor_med_rel_contaminated":$medRelFlagged,"rebenched":$rebenchedArr,"rebench_reps":$rebenchReps,"floor_firstpass":${r3(floorFirstPass)},"cpu_ref":${r3(cpuRef)},"cpu_ref_post":${r3(cpuRefPost)}$shuffleField$onlyField}"""
    println(json)
    // Also persist the full JSON as a file: the driver captures a
    // bounded stdout tail, and BENCH_r06's 137-query line was clipped
    // to ~61 entries — the file is the durable artifact (VERDICT r6 #2).
    // Default-path rule lives in BenchSentinels.resolveOutPath (spec'd):
    // ONLY-filtered runs → bench_partial.json; full runs → never
    // overwrite an existing bench_round.json without SPARK_GRAFT_BENCH_OUT
    // (VERDICT r12 #7 — the driver's own full run clobbered the committed
    // artifact two rounds running).
    val outPath = BenchSentinels.resolveOutPath(
      sys.env.get("SPARK_GRAFT_BENCH_OUT"), only.isDefined,
      p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
      () => System.currentTimeMillis())
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"WARNING: could not write $outPath: ${e.getMessage}") }
    if (loadContaminated)
      System.err.println(s"WARNING: floor median ${floorMed}s exceeds ${floorBound}s — " +
        "machine under external load; per-query medians are NOT comparable " +
        "across rounds. Re-run on a quiet box before recording.")
    if (repContaminated.nonEmpty)
      System.err.println(s"WARNING: ${repContaminated.size} queries have median/min > 3 " +
        s"(${repContaminated.mkString(", ")}) — compare their MIN, the medians " +
        "absorbed transient load; do not record them as regressions.")
    if (floorContaminated.nonEmpty)
      System.err.println(s"WARNING: ${floorContaminated.size} queries ran under SUSTAINED " +
        s"external load (sweep-local floor median > ${floorBound}s: " +
        s"${floorContaminated.mkString(", ")}) — their medians AND mins are " +
        "inflated; re-bench them on a quiet box before recording.")
    if (floorSpikeContaminated.nonEmpty)
      System.err.println(s"WARNING: ${floorSpikeContaminated.size} queries caught a floor " +
        f"SPIKE inside their sweep (floor sample > $spikeBound%.3fs = " +
        s"max(${spikeRel}x run floor median, ${spikeAbs}s): " +
        s"${floorSpikeContaminated.mkString(", ")}) — their medians are " +
        "untrustworthy even if rep ratios look clean (BENCH_r09 phantom class); " +
        "re-bench them before recording regressions.")
    if (floorMedRelContaminated.nonEmpty)
      System.err.println(s"WARNING: ${floorMedRelContaminated.size} queries ran under " +
        f"sustained MODERATE load (sweep floor median > $medRelBound%.3fs = " +
        s"max(${medRel}x run floor median, ${medAbs}s): " +
        s"${floorMedRelContaminated.mkString(", ")}) — the BENCH_r10 slip class; " +
        "their medians are inflated even though the absolute floor bound passed.")
    if (rebenched.nonEmpty)
      System.err.println(s"INFO: ${rebenched.size} flagged queries were re-benched " +
        s"solo (reps=$rebenchReps) and their entries replaced: " +
        s"${rebenched.mkString(", ")}. Sentinel lists above reflect the FINAL " +
        "entries — any still-flagged query stayed contaminated through the re-run.")
    // Compact totals-only trailer, printed LAST: the full line above is
    // ~10 KB at 171 queries and the driver's bounded stdout tail clips
    // it mid-map (BENCH_r07 parsed:null). The trailer carries the
    // headline + sentinel verdicts in <300 bytes so tail-capture always
    // keeps a parseable record; per-query detail lives in the file.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries_n":${results.size},"sf":"$sfDir","reps":$reps,"floor":$floorMed,"floor_max":$floorMax,"load_contaminated":$loadContaminated,"rep_contaminated_n":${repContaminated.size},"floor_contaminated_n":${floorContaminated.size},"floor_spike_contaminated_n":${floorSpikeContaminated.size},"floor_med_rel_contaminated_n":${floorMedRelContaminated.size},"rebenched_n":${rebenched.size}$shuffleTrailer,"detail":"$outPath"}""")
    spark.stop()
  }
}
