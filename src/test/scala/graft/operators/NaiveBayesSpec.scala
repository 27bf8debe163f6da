package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The deterministic multinomial NB quality filter (VERDICT r12 #5).
  * Parameters are hand-checked against the closed form on a 4-doc
  * corpus; apply is checked for unseen-token smoothing, empty-doc
  * prior-only scoring, and the lexicographic tie-break. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // good: "spark fast fast", "spark join"  (5 tokens: spark x2, fast x2, join x1)
  // bad:  "slow slow junk"                 (3 tokens: slow x2, junk x1)
  private def labeled = Seq(
    ("good", Seq("spark", "fast", "fast")),
    ("good", Seq("spark", "join")),
    ("bad", Seq("slow", "slow", "junk"))
  ).toDF("label", "tokens")

  private def mn(p: Double): Long = math.round(-math.log(p) * 1e6)

  test("train: add-one smoothed micro-nat costs, prior and unseen pseudo rows") {
    val m = NaiveBayes.train(labeled).orderBy("label", "token")
      .as[(String, String, Long, Long)].collect()
    // shared vocabulary V = 5 (spark, fast, join, slow, junk)
    val v = 5
    val expected = Set(
      ("good", "spark", 2L, mn(3.0 / (5 + v))),
      ("good", "fast", 2L, mn(3.0 / (5 + v))),
      ("good", "join", 1L, mn(2.0 / (5 + v))),
      ("bad", "slow", 2L, mn(3.0 / (3 + v))),
      ("bad", "junk", 1L, mn(2.0 / (3 + v))),
      ("good", NaiveBayes.PriorToken, 2L, mn(2.0 / 3.0)),
      ("bad", NaiveBayes.PriorToken, 1L, mn(1.0 / 3.0)),
      ("good", NaiveBayes.UnseenToken, 0L, mn(1.0 / (5 + v))),
      ("bad", NaiveBayes.UnseenToken, 0L, mn(1.0 / (3 + v))))
    assert(m.toSet == expected)
  }

  test("apply: smoothing floor for unseen tokens, prior-only empty docs, tie to smaller label") {
    val model = NaiveBayes.train(labeled)
    val params = NaiveBayes.broadcastParams(model, Seq("bad", "good"))
    val docs = Seq(
      (1L, Seq("spark", "fast")),   // seen-by-good tokens
      (2L, Seq("zzz")),             // unseen everywhere → smoothing floor
      (3L, Seq.empty[String])       // prior-only
    ).toDF("doc_id", "tokens")
    val out = NaiveBayes.score(docs, params, Seq("bad", "good"))
      .select($"doc_id", $"cost_bad", $"cost_good", $"pred")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val v = 5
    assert(out(0) == ((1L, mn(1.0 / 3) + 2 * mn(1.0 / (3 + v)),
      mn(2.0 / 3) + 2 * mn(3.0 / (5 + v)), "good")))
    // both floors engage; good wins on the cheaper prior (2/3 of docs)
    assert(out(1) == ((2L, mn(1.0 / 3) + mn(1.0 / (3 + v)),
      mn(2.0 / 3) + mn(1.0 / (5 + v)), "good")))
    // empty doc: priors only — the majority class ("good", 2/3) wins
    assert(out(2) == ((3L, mn(1.0 / 3), mn(2.0 / 3), "good")))
    // tie-break: equal costs resolve to the lexicographically smaller
    // label — synthesize a tie with a symmetric corpus
    val sym = Seq(("good", Seq("x")), ("bad", Seq("y"))).toDF("label", "tokens")
    val symP = NaiveBayes.broadcastParams(NaiveBayes.train(sym), Seq("bad", "good"))
    val tied = NaiveBayes.score(Seq((9L, Seq.empty[String])).toDF("doc_id", "tokens"),
      symP, Seq("bad", "good"))
      .select($"cost_bad", $"cost_good", $"pred")
      .as[(Long, Long, String)].head()
    assert(tied._1 == tied._2 && tied._3 == "bad")
  }

  test("train ignores reserved pseudo-token names arriving as real tokens") {
    val dirty = Seq(("good", Seq("ok", NaiveBayes.PriorToken))).toDF("label", "tokens")
    val toks = NaiveBayes.train(dirty)
      .filter(col("cnt") > 0 || col("token") === NaiveBayes.UnseenToken)
      .select("token").as[String].collect().toSet
    assert(toks == Set("ok", NaiveBayes.PriorToken, NaiveBayes.UnseenToken))
    // the __prior__ row present is the PSEUDO row (doc census), not a
    // token row: exactly one row carries that name
    assert(NaiveBayes.train(dirty)
      .filter(col("token") === NaiveBayes.PriorToken).count() == 1)
  }

  test("bucketed lookup resolves every token when vocab exceeds the bucket count") {
    // r16: broadcastParams hashes the vocabulary into LookupBuckets
    // slots — with |V| = 3 × buckets every slot holds collisions, so
    // this pins the bucket-array indexing against a closed-form score
    // (a mis-indexed or dropped slot would hit the unseen floor and
    // shift the integer cost).
    val v = 3 * NaiveBayes.LookupBuckets
    val vocab = (0 until v).map(i => f"tok$i%05d")
    val train = Seq(("one", vocab), ("two", Seq("other"))).toDF("label", "tokens")
    val model = NaiveBayes.train(train)
    val params = NaiveBayes.broadcastParams(model, Seq("one", "two"))
    val probe = vocab.grouped(v / 4).map(_.head).toSeq :+ "unseen-token"
    val out = NaiveBayes.score(
      Seq((1L, probe)).toDF("doc_id", "tokens"), params, Seq("one", "two"))
      .select($"cost_one", $"pred").as[(Long, String)].head()
    // every vocab token costs mn(2/(v + (v+1))) under class "one"
    // (cnt 1, total v, shared vocab v+1); the unseen probe pays the floor
    val tokCost = math.round(-math.log(2.0 / (v + v + 1)) * 1e6)
    val floor = math.round(-math.log(1.0 / (v + v + 1)) * 1e6)
    val prior = math.round(-math.log(1.0 / 2.0) * 1e6)
    assert(out._1 == prior + 4 * tokCost + floor)
    // class "two" (total 1) has a CHEAPER smoothing floor ln(v+2) than
    // class "one"'s per-token ln((2v+1)/2), so it wins the argmin —
    // the point here is the exact cost_one integer above, which a
    // mis-indexed or dropped bucket slot would shift to the floor
    assert(out._2 == "two")
  }
}
