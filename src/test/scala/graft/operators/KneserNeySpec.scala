package graft.operators

import graft.SparkSpec

/** The interpolated Kneser-Ney bigram LM (the KenLM/CCNet perplexity
  * gate). Parameters are hand-checked against the closed form on a
  * 2-doc corpus; scoring is checked for all four lookup paths — seen
  * pair, backoff+continuation, unknown-context free backoff, and the
  * OOV continuation floor. */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  // d1: a b a c   → (<s>,a)(a,b)(b,a)(a,c)
  // d2: a b       → (<s>,a)(a,b)
  // census: (<s>,a):2 (a,b):2 (b,a):1 (a,c):1; B = 4 bigram types
  private def train = Seq(
    Seq("a", "b", "a", "c"),
    Seq("a", "b")
  ).toDF("tokens")

  private def mn(p: Double): Long = math.round(-math.log(p) * 1e6)
  // the operator's fused interpolated probability, same op order
  private def pBi(c2: Long, tot: Long, n1f: Long, n1p: Long, b: Long) =
    (c2 - 0.75) / tot + (0.75 * n1f / tot) * (n1p / b.toDouble)

  test("train: fused bi costs plus bo/cont/unk decomposition rows") {
    val m = KneserNey.train(train).orderBy("kind", "w1", "w2")
      .as[(String, String, String, Long, Long)].collect()
    val expected = Set(
      ("bi", "<s>", "a", 2L, mn(pBi(2, 2, 1, 2, 4))),
      ("bi", "a", "b", 2L, mn(pBi(2, 3, 2, 1, 4))),
      ("bi", "b", "a", 1L, mn(pBi(1, 1, 1, 2, 4))),
      ("bi", "a", "c", 1L, mn(pBi(1, 3, 2, 1, 4))),
      ("bo", "<s>", "", 1L, mn(0.75 * 1 / 2)),
      ("bo", "a", "", 2L, mn(0.75 * 2 / 3)),
      ("bo", "b", "", 1L, mn(0.75 * 1 / 1)),
      ("cont", "", "a", 2L, mn(2 / 4.0)),
      ("cont", "", "b", 1L, mn(1 / 4.0)),
      ("cont", "", "c", 1L, mn(1 / 4.0)),
      ("unk", "", "", 0L, mn(1.0 / 5)))
    assert(m.toSet == expected)
  }

  test("score: seen / backoff+cont / unknown-context / OOV floor paths") {
    val model = KneserNey.train(train)
    val docs = Seq(
      (1L, Seq("a", "b")),  // both bigrams seen
      (2L, Seq("b", "c")),  // (<s>,b) and (b,c) unseen → bo + cont
      (3L, Seq("z", "a"))   // (<s>,z) → bo+unk; (z,a) → free backoff + cont
    ).toDF("doc_id", "tokens")
    val out = KneserNey.score(docs, model)
      .select($"doc_id", $"n_bg", $"cost")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2L, mn(pBi(2, 2, 1, 2, 4)) + mn(pBi(2, 3, 2, 1, 4)))))
    assert(out(1) == ((2L, 2L,
      (mn(0.75 * 1 / 2) + mn(1 / 4.0)) + (mn(0.75 * 1 / 1) + mn(1 / 4.0)))))
    assert(out(2) == ((3L, 2L,
      (mn(0.75 * 1 / 2) + mn(1.0 / 5)) + (0L + mn(2 / 4.0)))))
  }

  test("avg_nats is the 6dp mean per-bigram cost in nats") {
    val docs = Seq((1L, Seq("a", "b"))).toDF("doc_id", "tokens")
    val Array((cost, avg)) = KneserNey.score(docs, KneserNey.train(train))
      .select($"cost", $"avg_nats").as[(Long, Double)].collect()
    assert(avg == math.floor(cost / 2.0 / 1e6 * 1e6 + 0.5) / 1e6)
  }
}
