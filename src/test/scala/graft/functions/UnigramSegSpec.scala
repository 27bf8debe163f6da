package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.UnigramLm

/** The native UnigramSeg expression must reproduce the original
  * spans-explode → cost-join → groupBy-map → two-interpreted-folds
  * pipeline bit-for-bit (r17: UnigramLm.segment swapped that shape —
  * one shuffle plus O(n²) lambda evals per word — for a broadcast
  * sorted-vocab row and a single codegen'd DP call; this spec IS the
  * equivalence proof the swap rides on, the CdcBoundsSpec pattern).
  *
  * Covers the pinned edge semantics: partial-coverage words (some
  * spans miss the vocab → Inf arms in the min), ZERO-coverage words
  * (the old INNER join dropped them; the new path returns null and
  * filters), astral code points (substr counts code points, not
  * chars), and longest-piece tie-breaks. */
class UnigramSegSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r17 segment pipeline, verbatim. */
  private def hofSegment(census: DataFrame, costs: DataFrame): DataFrame = {
    def cand(acc: Column, m: Column, pos: Column, l: Int): Column =
      when(pos >= l,
        element_at(acc, (pos - lit(l) + lit(1)).cast("int")) +
          coalesce(element_at(m,
            ((pos - lit(l) + lit(1)) * 10 + lit(l)).cast("long")),
            lit(UnigramLm.Inf)))
        .otherwise(lit(UnigramLm.Inf))
    def chosenLen(s: Column, m: Column, p: Column): Column =
      (UnigramLm.MaxPiece to 2 by -1)
        .foldLeft(null.asInstanceOf[Column]) { (acc, l) =>
          val hit = (p >= l) &&
            (cand(s, m, p, l) === element_at(s, (p + 1).cast("int")))
          if (acc == null) when(hit, lit(l)) else acc.when(hit, lit(l))
        }.otherwise(lit(1))
    val sp = census
      .select(col("w"), col("freq"), explode(UnigramLm.spans(col("w"))).as("sp"))
      .select(col("w"), col("freq"), col("sp.i").as("i"),
        col("sp.len").as("len"), col("sp.piece").as("piece"))
      .join(broadcast(costs.select(col("piece"), col("cost"))), Seq("piece"))
    val mapped = sp.groupBy(col("w"), col("freq"))
      .agg(map_from_entries(collect_list(struct(
        (col("i").cast("long") * 10 + col("len")).as("k"),
        col("cost").as("v")))).as("m"))
    val n = length(col("w"))
    val fwd = aggregate(sequence(lit(1), n), array(lit(0L)),
      (acc, pos) => concat(acc, array(least(
        (1 to UnigramLm.MaxPiece).map(l => cand(acc, col("m"), pos, l)): _*))))
    val scored = mapped.withColumn("s", fwd)
    val back = aggregate(sequence(lit(1), n),
      struct(n.cast("int").as("p"),
        array().cast("array<string>").as("seg")),
      (acc, _) => {
        val p = acc.getField("p")
        val l = chosenLen(col("s"), col("m"), p)
        when(p === 0, acc).otherwise(struct(
          (p - l).cast("int").as("p"),
          concat(array(col("w").substr(p - l + lit(1), l)),
            acc.getField("seg")).as("seg")))
      })
    scored
      .select(col("w"), col("freq"), back.getField("seg").as("seg"),
        element_at(col("s"), (n + 1).cast("int")).as("score"))
      .select(col("w"), col("freq"), col("seg"),
        size(col("seg")).as("n_pieces"), col("score"))
  }

  private def collectSeg(df: DataFrame): Map[String, (Long, Seq[String], Int, Long)] =
    df.select(col("w"), col("freq"), col("seg"), col("n_pieces"), col("score"))
      .as[(String, Long, Seq[String], Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("native segment ≡ HOF pipeline on planted censuses") {
    // vocab: full single-char coverage for the latin words, a cheap
    // multi piece with tie pressure ("abab" splits two ways at equal
    // cost — longest-first backtrace must agree), astral single char,
    // and deliberately NO coverage for 'z' (partial/zero coverage)
    val census = Seq(
      ("abab", 10L), ("ab", 5L), ("ba", 4L), ("abcd", 2L), ("aaaa", 3L),
      ("x", 7L), ("𝄞a𝄞", 2L), ("azb", 1L), ("zz", 9L), ("naïve", 2L),
      ("ababab", 1L), ("dcba", 6L))
      .toDF("w", "freq")
    val costs = Seq(
      ("a", 100L), ("b", 110L), ("c", 90L), ("d", 95L), ("x", 500L),
      ("ï", 40L), ("n", 55L), ("v", 60L), ("e", 65L), ("𝄞", 30L),
      ("ab", 105L), ("ba", 105L), ("abab", 210L), ("cd", 80L),
      ("aaa", 240L), ("aa", 160L))
      .toDF("piece", "cost")
    val hof = collectSeg(hofSegment(census, costs))
    val nat = collectSeg(UnigramLm.segment(census, costs))
    assert(hof.keySet == nat.keySet,
      s"row-drop semantics diverge: ${hof.keySet} vs ${nat.keySet}")
    // zero-coverage word really dropped in BOTH (proves the guard bit)
    assert(!hof.contains("zz") && !nat.contains("zz"))
    // partial coverage survives in both (z-span misses = Inf arms)
    assert(hof.contains("azb"))
    hof.foreach { case (w, exp) =>
      assert(nat(w) == exp, s"'$w': native ${nat(w)} != hof $exp")
    }
    // the astral word segmented by CODE POINTS: 3 pieces, not 5
    assert(nat("𝄞a𝄞")._2 == Seq("𝄞", "a", "𝄞"))
  }

  test("native segment ≡ HOF pipeline on a pseudo-random census") {
    val words = (0 until 200).map { i =>
      val len = 1 + (i * 7919) % 9
      (0 until len).map(j => "abcde".charAt((i * 31 + j * 17) % 5)).mkString
    }.distinct
    val census = words.zipWithIndex
      .map { case (w, i) => (w, (i % 13 + 1).toLong) }.toDF("w", "freq")
    val pieces = (for {
      l <- 1 to UnigramLm.MaxPiece
      i <- 0 until 30
    } yield (0 until l).map(j => "abcde".charAt((i * 13 + j * 7) % 5)).mkString)
      .distinct
    // drop 'e' single-char coverage: some words get Inf-padded paths
    val costs = pieces.filter(_ != "e").zipWithIndex
      .map { case (p, i) => (p, 50L + (i * 37) % 400) }.toDF("piece", "cost")
    val hof = collectSeg(hofSegment(census, costs))
    val nat = collectSeg(UnigramLm.segment(census, costs))
    assert(hof.keySet == nat.keySet)
    assert(hof.nonEmpty)
    hof.foreach { case (w, exp) =>
      assert(nat(w) == exp, s"'$w': native ${nat(w)} != hof $exp")
    }
  }
}
