package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bpe.applyMerge must implement textbook greedy left-to-right
  * non-overlapping BPE merge application — including the x==y run
  * case where naive string replacement diverges.
  */
class BpeSpec extends SparkSpec {

  private def applied(word: String, x: String, y: String): String = {
    import spark.implicits._
    Seq(word).toDF("w")
      .select(Bpe.applyMerge(Bpe.charTokens(col("w")), lit(x), lit(y)).as("s"))
      .head().getString(0)
  }

  test("merges every non-overlapping occurrence left to right") {
    assert(applied("banana", "a", "n") === "b|an|an|a")
  }

  test("x==y runs merge leftmost-first, merged token cannot re-merge") {
    assert(applied("aaaaa", "a", "a") === "aa|aa|a")
    assert(applied("aaaa", "a", "a") === "aa|aa")
  }

  test("single-char words pass through") {
    assert(applied("a", "a", "a") === "a")
  }

  test("no occurrence leaves the word as char tokens") {
    assert(applied("xyz", "a", "b") === "x|y|z")
  }

  test("multi-char tokens merge by token equality, not suffix match") {
    import spark.implicits._
    // tokens [xa, a]: merge (a, a) must NOT fire on token "xa"'s suffix
    val s = Seq(Seq("xa", "a")).toDF("t")
      .select(Bpe.applyMerge(col("t"), lit("a"), lit("a")).as("s"))
      .head().getString(0)
    assert(s === "xa|a")
    // tokens [an, a] under merge (an, a) fuse to one token
    val s2 = Seq(Seq("an", "a")).toDF("t")
      .select(Bpe.applyMerge(col("t"), lit("an"), lit("a")).as("s"))
      .head().getString(0)
    assert(s2 === "ana")
  }

  test("byteTokens: multi-byte scripts round-trip losslessly") {
    import spark.implicits._
    // 1-, 2- and 3-byte UTF-8 code points in one word
    for (w <- Seq("中文", "naïve", "tör", "a中b", "ß")) {
      val toks = Seq(w).toDF("w")
        .select(Bpe.byteTokens(col("w")).as("t"))
        .head().getSeq[String](0)
      // every token is one hex-coded byte; concatenation IS the word
      assert(toks.forall(t => t.length == 2 &&
        t.forall(c => "0123456789ABCDEF".contains(c))), s"$w -> $toks")
      val bytes = toks.map(Integer.parseInt(_, 16).toByte).toArray
      assert(new String(bytes, "UTF-8") == w)
      assert(toks.length == w.getBytes("UTF-8").length)
    }
  }

  test("byte merges fuse hex codes; merged concat still round-trips") {
    import spark.implicits._
    // "中" = E4 B8 AD; merge (E4, B8) then (E4B8, AD) rebuilds the char
    val t1 = Seq("中中").toDF("w")
      .select(Bpe.applyMergeTokens(Bpe.byteTokens(col("w")),
        lit("E4"), lit("B8")).as("t"))
    val t2 = t1.select(Bpe.applyMergeTokens(col("t"),
        lit("E4B8"), lit("AD")).as("t"))
      .head().getSeq[String](0)
    assert(t2 == Seq("E4B8AD", "E4B8AD"))
    val all = t2.mkString
    val bytes = all.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(new String(bytes, "UTF-8") == "中中") // no unknown path: lossless
  }

  test("learned merge columns may come from a broadcast 1-row frame") {
    import spark.implicits._
    val words = Seq("banana", "bandana").toDF("w")
    val m = Seq(("a", "n")).toDF("x", "y")
    val out = words.crossJoin(broadcast(m))
      .select(Bpe.applyMergeTokens(Bpe.charTokens(col("w")),
        col("x"), col("y")).as("t"))
      .select(size(col("t")).as("n")).as[Int].collect().sorted
    assert(out.toSeq === Seq(4, 5)) // b|an|an|a, b|an|d|an|a
  }
}
