package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property tests: the distributed operators must agree with naive
  * in-memory reference implementations on random inputs. ScalaCheck is
  * driven directly (no scalatest bridge in the offline dep set).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  private val eventsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(12, for {
      user <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 10000L)
      v <- Gen.choose(1, 100)
    } yield (user, t, v.toDouble)).map(_.distinctBy(e => (e._1, e._2)))

  // small vocabulary so shared windows arise organically, plus an
  // explicitly planted shared slice for guaranteed long runs
  private val substringDocsGen: Gen[List[(Long, List[String])]] = for {
    n <- Gen.choose(2, 5)
    vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    docs <- Gen.listOfN(n, Gen.choose(5, 25).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab))))
    shared <- Gen.listOfN(7, Gen.oneOf(vocab))
    at <- Gen.choose(0, 4)
  } yield docs.zipWithIndex.map { case (d, i) =>
    // plant the shared block into the first two docs at different offsets
    val toks = if (i == 0) d.take(at) ++ shared ++ d.drop(at)
               else if (i == 1) shared ++ d
               else d
    ((i + 1).toLong, toks)
  }

  /** Naive reference: maximal equal-token stretches per (pair, diagonal)
    * of length >= minRun — exactly what window-hash runs report. */
  private def naiveRuns(docs: List[(Long, List[String])], w: Int, minRun: Int)
      : Set[(Long, Long, Int, Int, Long)] = {
    val out = Set.newBuilder[(Long, Long, Int, Int, Long)]
    for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      d <- -(tb.length - 1) to (ta.length - 1)
    } {
      // positions i in a aligned with i - d in b (0-based)
      var i = math.max(0, d)
      val end = math.min(ta.length, tb.length + d)
      while (i < end) {
        if (ta(i) == tb(i - d)) {
          var j = i
          while (j < end && ta(j) == tb(j - d)) j += 1
          val len = j - i
          if (len >= minRun && len >= w)
            out += ((ia, ib, i + 1, i - d + 1, len.toLong))
          i = j
        } else i += 1
      }
    }
    out.result()
  }

  test("substringRuns matches naive maximal-diagonal-stretch computation") {
    check(Prop.forAll(substringDocsGen) { docs =>
      val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("id", "text")
      val got = Dedup.substringRuns(df, "id", "text", w = 3, minRun = 4,
          maxWindowFreq = None)
        .select("id_a", "id_b", "start_a", "start_b", "run_tokens")
        .as[(Long, Long, Int, Int, Long)].collect().toSet
      val want = naiveRuns(docs, w = 3, minRun = 4)
      Prop(got == want) :| s"got $got\nwant $want"
    })
  }

  test("substringApply matches naive span-coverage removal") {
    check(Prop.forAll(substringDocsGen) { docs =>
      val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("id", "text")
      val got = Dedup.substringApply(df, "id", "text", w = 3, minRun = 4,
          maxWindowFreq = None)
        .select("id", "n_tok", "n_kept", "clean_hash")
        .as[(Long, Long, Long, Option[String])].collect().toSet
      val runs = naiveRuns(docs, w = 3, minRun = 4)
      val want = docs.map { case (id, toks) =>
        val covered = runs.collect {
          case (_, b, _, sb, len) if b == id =>
            (sb to (sb + len.toInt - 1)).toSet
        }.flatten
        val kept = toks.zipWithIndex.collect {
          case (t, i) if !covered.contains(i + 1) => t
        }
        val hash = if (kept.isEmpty) None else Some(
          java.security.MessageDigest.getInstance("MD5")
            .digest(kept.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
        (id, toks.size.toLong, kept.size.toLong, hash)
      }.toSet
      Prop(got == want) :| s"got $got\nwant $want"
    })
  }

  test("sessionize matches a naive in-memory sessionizer") {
    check(Prop.forAll(eventsGen) { evs =>
      evs.isEmpty || {
        val df = evs.map { case (u, t, v) => (u, ts(t), v) }
          .toDF("user_id", "ts", "value")
        val got = Sessionize.sessions(df, "user_id", "ts", "value", 600L)
          .select("user_id", "session_id", "n_events", "total_value")
          .as[(Long, Long, Long, Double)].collect().toSet
        val want = evs.groupBy(_._1).flatMap { case (u, es) =>
          val sorted = es.sortBy(_._2)
          // split at gaps > 600s, 1-based session ids
          val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
            case (acc @ cur :: rest, e) =>
              if (e._2 - cur.head._2 > 600L) List(e) :: acc
              else (e :: cur) :: rest
            case (Nil, e) => List(List(e))
          }.reverse
          sessions.zipWithIndex.map { case (s, i) =>
            (u, (i + 1).toLong, s.size.toLong, s.map(_._3).sum)
          }
        }.toSet
        got == want
      }
    })
  }

  test("asof join matches a naive latest-at-or-before lookup") {
    val gen = for {
      l <- eventsGen
      r <- eventsGen
    } yield (l, r)
    check(Prop.forAll(gen) { case (l, r) =>
      l.isEmpty || {
        val left = l.map { case (u, t, v) => (u, ts(t), v) }.toDF("k", "ts", "lv")
        val right = r.map { case (u, t, v) => (u, ts(t), v) }.toDF("k", "ts", "rv")
        val got = AsOf.join(left, right, Seq("k"), "ts", "ts", Seq("rv"))
          .select("k", "ts", "rv")
          .as[(Long, Timestamp, Option[Double])].collect()
          .map { case (k, t, v) => ((k, t.getTime / 1000), v) }.toMap
        val want = l.map { case (u, t, _) =>
          val cands = r.filter(e => e._1 == u && e._2 <= t)
          ((u, t), if (cands.isEmpty) None
            else Some(cands.maxBy(_._2)._3))
        }.toMap
        got == want
      }
    })
  }
}

class SimilarityJoinPropertySpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  test("selfJoin jaccard matches naive all-pairs computation") {
    val word = Gen.oneOf("red", "blue", "cold", "hot", "widget", "gear", "bolt")
    val nameGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, word))
      .map(_.distinct.mkString(" "))
    val gen = Gen.listOfN(8, nameGen).map(_.distinct.filter(_.nonEmpty))
    val prop = Prop.forAll(gen) { names =>
      names.size < 2 || {
        val df = names.toDF("name")
        val got = SimilarityJoin.selfJoin(df, "name", "name", 0.3)
          .select("name_a", "name_b", "jaccard")
          .as[(String, String, Double)].collect()
          .map { case (a, b, j) => ((a, b), math.rint(j * 1e9) / 1e9) }.toMap
        val want = (for {
          a <- names; b <- names if a < b
          ta = a.split(" ").toSet; tb = b.split(" ").toSet
          j = ta.intersect(tb).size.toDouble / ta.union(tb).size
          if j >= 0.3
        } yield ((a, b), math.rint(j * 1e9) / 1e9)).toMap
        got == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}

class TopKPropertySpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import org.scalacheck.{Gen, Prop, Test => SCTest}
  import spark.implicits._

  test("custom top-k-per-key matches the row_number window on random data incl. nulls") {
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c")
      id <- Gen.choose(1L, 50L)
      v <- Gen.option(Gen.choose(-100, 100).map(_.toDouble))
    } yield (k, id, v)
    val gen = Gen.listOfN(30, rowGen).map(_.distinctBy(r => (r._1, r._2)))
    val prop = Prop.forAll(gen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "id", "v")
        val got = TopK.perKey(df, Seq("k"), "v", "id", 3)
          .select("k", "id").as[(String, Long)].collect().toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"k").orderBy($"v".desc, $"id") // desc → NULLS LAST
        val want = df.withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3).select("k", "id").as[(String, Long)].collect().toSet
        got == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("key cardinality beyond the cap degrades (partial flush + final spill), stays exact") {
    // 5000 distinct keys, cap 50 → the partial execs flush ~100 chunks
    // and the final exec spill-fans out; result must still equal the
    // window formulation exactly
    spark.conf.set(graft.plans.TopKPerKeyExec.MaxKeysConfKey, "50")
    try {
      val df = (1L to 20000L)
        .map(i => (i % 5000, i, (i * 2654435761L % 997).toDouble))
        .toDF("k", "id", "v")
      val got = TopK.perKey(df, Seq("k"), "v", "id", 2)
        .select("k", "id").as[(Long, Long)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"v".desc, $"id")
      val want = df.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 2).select("k", "id").as[(Long, Long)].collect().toSet
      assert(got == want)
      assert(got.size == 10000) // 2 per key — the cap visibly exceeded
    } finally spark.conf.unset(graft.plans.TopKPerKeyExec.MaxKeysConfKey)
  }
}

class ComponentsPropertySpec extends SparkSpec {
  import org.scalacheck.{Gen, Prop, Test => SCTest}
  import spark.implicits._

  test("connected components match a naive min-label fixpoint on random graphs") {
    val edgeGen = for {
      a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L)
    } yield (a, b)
    val gen = Gen.listOfN(10, edgeGen)
    val prop = Prop.forAll(gen) { edges =>
      edges.isEmpty || {
        val got = Components.connected(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        var lab = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> n).toMap
        var changed = true
        while (changed) {
          changed = false
          for ((x, y) <- edges) {
            val m = math.min(lab(x), lab(y))
            if (lab(x) != m) { lab += x -> m; changed = true }
            if (lab(y) != m) { lab += y -> m; changed = true }
          }
        }
        got == lab
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
