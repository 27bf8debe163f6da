package graft

import java.util.concurrent.{Executors, ThreadFactory, TimeUnit}
import java.util.concurrent.{FutureTask, TimeoutException}

/** Hostile-input gate for the zero-dep parser fleet (round 16,
  * VERDICT r15 #2 — the Avro inflate-spin bug proved the class):
  * seeded DETERMINISTIC truncations, bit flips and garbage must
  * ALWAYS terminate promptly in the loud-failure contract — an
  * IllegalArgumentException naming the offender. Anything else is a
  * finding: an escaped JVM exception (ArrayIndexOutOfBounds, NPE,
  * NegativeArraySize, ZipException, StackOverflow…), an accidental
  * NumberFormatException (parseInt on unvalidated bytes — an IAE
  * subclass, but not a named contract failure), or a hang past the
  * per-case budget (the infinite-loop class).
  */
object FuzzHarness {

  private val pool = Executors.newCachedThreadPool(new ThreadFactory {
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, "fuzz-probe")
      t.setDaemon(true)
      t
    }
  })

  /** None = contract held (clean decode or loud IAE); Some = finding. */
  def probe(label: String, input: Array[Byte], decode: Array[Byte] => Any,
            timeoutMs: Long = 3000): Option[String] = {
    val task = new FutureTask[Option[String]](() =>
      try { decode(input); None } catch {
        case e: NumberFormatException =>
          Some(s"$label: accidental NumberFormatException: ${e.getMessage}")
        case _: IllegalArgumentException => None
        case t: Throwable =>
          Some(s"$label: escaped ${t.getClass.getSimpleName}: ${t.getMessage}")
      })
    pool.execute(task)
    try task.get(timeoutMs, TimeUnit.MILLISECONDS)
    catch {
      case _: TimeoutException =>
        task.cancel(true)
        Some(s"$label: HANG > ${timeoutMs}ms (input ${input.length} B)")
      case e: java.util.concurrent.ExecutionException =>
        Some(s"$label: harness: ${e.getCause}")
    }
  }

  /** The full seeded sweep for one codec: truncations at every scale,
    * 1–4-bit flips, garbage behind the valid prefix, pure garbage.
    * Returns all findings (empty = the codec held the contract). */
  def fuzz(name: String, valid: Array[Byte], decode: Array[Byte] => Any,
           seed: Long, cases: Int = 300): Seq[String] = {
    require(valid.length > 8, s"$name: fixture too small to fuzz")
    val sane = probe(s"$name/valid", valid, decode)
    val rnd = new java.util.Random(seed)
    val findings = Seq.newBuilder[String]
    sane.foreach(s => findings += s + " (the VALID fixture!)")
    var i = 0
    while (i < cases) {
      val input = (i % 10) match {
        case 0 | 1 | 2 => // truncation, biased toward short prefixes
          val n = 1 + rnd.nextInt(valid.length - 1)
          valid.take(if (i % 10 == 0) math.min(n, 24) else n)
        case 3 | 4 | 5 | 6 => // 1–4 bit flips
          val b = valid.clone()
          val flips = 1 + rnd.nextInt(4)
          var k = 0
          while (k < flips) {
            val at = rnd.nextInt(b.length)
            b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
            k += 1
          }
          b
        case 7 | 8 => // valid prefix + garbage tail
          val keep = rnd.nextInt(valid.length)
          val tail = new Array[Byte](1 + rnd.nextInt(valid.length))
          rnd.nextBytes(tail)
          valid.take(keep) ++ tail
        case _ => // pure garbage
          val b = new Array[Byte](1 + rnd.nextInt(2 * valid.length))
          rnd.nextBytes(b)
          b
      }
      probe(s"$name/case$i", input, decode).foreach(findings += _)
      i += 1
    }
    findings.result()
  }

  /** Assertion helper: fail with the first findings, compactly. */
  def assertClean(findings: Seq[String]): Unit =
    assert(findings.isEmpty,
      s"${findings.length} findings:\n" + findings.take(12).mkString("\n"))
}
