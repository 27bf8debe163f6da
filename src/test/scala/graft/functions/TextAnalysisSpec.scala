package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def run1[T](c: org.apache.spark.sql.Column, input: String)(
      implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(input).toDF("s").select(c.as("r")).as[T].head()

  test("langId picks the language with the most marker words") {
    val c = TextAnalysis.langId(col("s"))
    assert(run1[String](c, "the cat and the dog is here") == "en")
    assert(run1[String](c, "der Hund und die Katze") == "de")
    assert(run1[String](c, "le chat et la maison est grande") == "fr")
  }

  test("quality score is bounded and monotone in stopword share") {
    val c = TextAnalysis.qualityScore(col("s"))
    val low = run1[Double](c, "zzz qqq")
    val high = run1[Double](c, ("the data of a pipeline and the " * 20).trim)
    assert(low >= 0.0 && low <= 1.0 && high >= 0.0 && high <= 1.0)
    assert(high > low)
  }

  test("token counts: whitespace vs subword") {
    assert(run1[Int](TextAnalysis.tokenCount(col("s")), "a  b\tc") == 3)
    // don't + a comma: ["don", "'", "t", ","] + ["count", "it"]
    assert(run1[Int](TextAnalysis.subwordCount(col("s")), "don't count it,") == 6)
  }

  test("fingerprint is invariant to word order, case, punctuation, dup words") {
    val c = TextAnalysis.fingerprint(col("s"))
    val a = run1[String](c, "Hello, world! hello")
    val b = run1[String](c, "world HELLO")
    assert(a == b)
    assert(a != run1[String](c, "another doc"))
  }

  test("wordShingles and charGrams produce ordered distinct grams") {
    val sh = run1[Seq[String]](TextAnalysis.wordShingles(col("s"), 2), "a b a b")
    assert(sh == Seq("a b", "b a"))
    val gr = run1[Seq[String]](TextAnalysis.charGrams(col("s"), 2), "abab")
    assert(gr == Seq("ab", "ba"))
    assert(run1[Seq[String]](TextAnalysis.wordShingles(col("s"), 3), "a b") == Nil)
  }
}
