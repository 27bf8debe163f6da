package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the unigram-LM trainer's hard-EM trajectory on a corpus
  * engineered so EM genuinely moves the model: seed counts favor
  * pieces the Viterbi E-step then starves, so round-2 costs differ
  * from round-1 and the final segmentation is the linguistically
  * "right" one ("abab" → [ab, ab], not chars). */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val census = Seq(
    ("abab", 10L), ("ab", 5L), ("cd", 3L), ("abcd", 2L), ("x", 7L))
    .toDF("w", "freq")

  test("spans explode all candidate pieces up to MaxPiece") {
    val got = census.filter(col("w") === "abab")
      .select(explode(UnigramLm.spans(col("w"))).as("sp"))
      .select(col("sp.i"), col("sp.len"), col("sp.piece"))
      .as[(Int, Int, String)].collect().toSet
    assert(got.contains((1, 4, "abab")) && got.contains((2, 2, "ba")) &&
      got.contains((4, 1, "b")))
    assert(got.size == 4 + 3 + 2 + 1) // len1..4 spans of a 4-char word
  }

  test("segment: Viterbi picks the best path, score is the integer sum") {
    // costs handcrafted: 'ab' cheap, chars expensive → abab = ab+ab
    // segment's precondition (the trainer always guarantees it):
    // every census char is in the vocab, so every word has a path
    val costs = Seq(("a", 100L, 100L), ("b", 100L, 100L), ("c", 1L, 50L),
      ("d", 1L, 50L), ("x", 1L, 500L), ("ab", 1L, 30L))
      .toDF("piece", "cnt", "cost")
    val got = UnigramLm.segment(census, costs)
      .select(col("w"), array_join(col("seg"), " ").as("seg"),
        col("n_pieces"), col("score"))
      .as[(String, String, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("abab") == (("ab ab", 2, 60L)))
    assert(got("ab") == (("ab", 1, 30L)))
    assert(got("cd") == (("c d", 2, 100L)))
    assert(got("abcd") == (("ab c d", 3, 130L)))
    assert(got("x") == (("x", 1, 500L)))
  }

  test("hard-EM trajectory: round-2 re-weights pieces and converges the segmentation") {
    val trained = UnigramLm.train(census, topMulti = 3, rounds = 2)
    val pieces = trained.select(col("piece"), col("cnt"), col("cost"))
      .as[(String, Long, Long)].collect().map(p => p._1 -> ((p._2, p._3))).toMap
    // seed vocab (topMulti=3) elects {ab:27, aba:10, abab:10} — but
    // round-1 Viterbi paths never use "aba", so hard-EM PRUNES it
    // while "abab" survives as the whole-word piece (its single-piece
    // cost beats ab+ab). This is the trajectory the spec pins: EM
    // moved the model away from its seed.
    assert(pieces.contains("ab") && pieces.contains("abab"))
    assert(!pieces.contains("aba"), s"EM should prune the unused seed piece; got ${pieces.keys}")
    val seg = UnigramLm.segment(census, trained)
      .select(col("w"), array_join(col("seg"), " ").as("seg"))
      .as[(String, String)].collect().toMap
    assert(seg("abab") == "abab", s"got $seg")
    assert(seg("ab") == "ab")
    assert(seg("abcd") == "ab c d")
    // chars keep the add-one floor: x was never a path piece of any
    // multi-char word but must stay covered
    assert(pieces.contains("x") && pieces("x")._1 == 7L)
  }
}
