package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.NaiveBayes

/** The native NbCost expression must reproduce the original HOF
  * scoring fold bit-for-bit (r17: NaiveBayes.score swapped the
  * interpreted per-token aggregate for the tight-loop expression —
  * this spec IS the equivalence proof, the CdcBoundsSpec pattern),
  * including the engine-internal xxhash64-mod-B bucket choice and the
  * fold's null algebra. */
class NbCostSpec extends SparkSpec {
  import spark.implicits._

  private val B = NaiveBayes.LookupBuckets

  /** The pre-r17 fold, verbatim. */
  private def hofCost(tokensCol: Column, l: String): Column =
    aggregate(tokensCol, col(s"prior_$l"),
      (acc, t) => acc +
        coalesce(element_at(
          element_at(col(s"arr_$l"), (pmod(xxhash64(t), lit(B)).cast("int")) + 1), t),
          col(s"unseen_$l")))

  private def natCost(tokensCol: Column, l: String): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(graft.functions.expr.NbCost(
      expression(tokensCol), expression(col(s"arr_$l")),
      expression(col(s"prior_$l")), expression(col(s"unseen_$l")), B))
  }

  private def compare(docs: DataFrame, params: DataFrame,
                      labels: Seq[String]): Unit = {
    val both = docs.crossJoin(broadcast(params))
      .select(col("doc_id") +:
        labels.flatMap(l => Seq(hofCost(col("tokens"), l).as(s"h_$l"),
          natCost(col("tokens"), l).as(s"n_$l"))): _*)
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      labels.zipWithIndex.foreach { case (l, i) =>
        val h = if (r.isNullAt(1 + 2 * i)) null else r.getLong(1 + 2 * i)
        val n = if (r.isNullAt(2 + 2 * i)) null else r.getLong(2 + 2 * i)
        assert(h == n, s"doc ${r.get(0)} class $l: hof=$h native=$n")
      }
    }
  }

  test("native cost ≡ HOF fold on a trained model incl. unseen tokens") {
    val labeled = Seq(
      ("good", Seq("clean", "prose", "with", "structure", "prose")),
      ("good", Seq("well", "formed", "text", "with", "clean", "words")),
      ("bad", Seq("spam", "spam", "buy", "now", "buy")),
      ("bad", Seq("click", "here", "now", "spam")))
      .toDF("label", "tokens")
    val params = NaiveBayes.broadcastParams(
      NaiveBayes.train(labeled), Seq("bad", "good"))
    val docs = Seq(
      (1L, Seq("clean", "prose")),
      (2L, Seq("buy", "spam", "now")),
      (3L, Seq("neverseen", "tokens", "only", "zzz")),
      (4L, Seq.empty[String]),
      (5L, Seq("clean", "neverseen", "spam", "𝄞astral", "naïve")))
      .toDF("doc_id", "tokens")
    compare(docs, params, Seq("bad", "good"))
  }

  test("native cost ≡ HOF fold under forced bucket collisions and null arms") {
    // vocabulary 3× the bucket count: every slot holds collisions, so
    // the in-bucket linear scan really runs (the r16 collision-stress
    // discipline); plus hand-built params exercising the null algebra
    // (null map slots are inherent — most buckets are empty here)
    val v = 3 * B
    val labeled = (0 until v).map(i => ("c" + (i % 2), Seq(s"tok_$i")))
      .toDF("label", "tokens")
    val params = NaiveBayes.broadcastParams(
      NaiveBayes.train(labeled), Seq("c0", "c1"))
    val docs = Seq(
      (1L, (0 until 50).map(i => s"tok_${i * 61}")),
      (2L, Seq("tok_0", "missing_a", "tok_3071", "missing_b")),
      (3L, (0 until 8).map(i => s"gone_$i")))
      .toDF("doc_id", "tokens")
    compare(docs, params, Seq("c0", "c1"))
    // null tokens inside the array: xxhash64(null)-bucket + null map
    // key lookup → the unseen arm in both forms
    val nullTok = spark.sql(
      "SELECT 9L AS doc_id, array('tok_1', CAST(NULL AS STRING), 'tok_2') AS tokens")
    compare(nullTok, params, Seq("c0", "c1"))
  }

  test("null algebra: null tokens/prior → null; miss with null unseen poisons") {
    val docs = Seq((1L, Some(Seq("a", "zz")), 10L),
      (2L, None: Option[Seq[String]], 10L)).toDF("doc_id", "tokens", "ignore")
    // hand-built one-row params: arr_x covers only "a"; unseen_x NULL
    val params = spark.sql(s"""
      SELECT transform(sequence(1, $B), b ->
               CASE WHEN b = pmod(xxhash64('a'), $B) + 1
                 THEN map('a', 7L) END) AS arr_x,
             100L AS prior_x, CAST(NULL AS BIGINT) AS unseen_x""")
    val both = docs.crossJoin(broadcast(params))
      .select(col("doc_id"), hofCost(col("tokens"), "x").as("h"),
        natCost(col("tokens"), "x").as("n"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2)))
    both.foreach { case (id, h, n) => assert(h == n, s"doc $id: $h vs $n") }
    // doc 1 hits "a" then misses "zz" with unseen NULL → null in both
    assert(both.find(_._1 == 1L).get._2 == null)
    // doc 2: tokens null → null in both
    assert(both.find(_._1 == 2L).get._2 == null)
  }
}
