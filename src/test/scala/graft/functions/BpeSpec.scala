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
