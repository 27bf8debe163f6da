package graft.sources

/** Linear-backoff retry, matching the reference's retry semantics
  * (scraper_v2.py:297-302 / config.yaml `retry:` section): up to
  * `maxRetries` re-attempts, waiting `extraWaitPerRetry` MORE per
  * attempt (attempt n sleeps n × extraWaitPerRetry).
  *
  * In the batch engine this guards driver-side filesystem actions
  * (progress-marker writes, sink commits against eventually-consistent
  * stores) — task-level retries inside jobs are Spark's own
  * `spark.task.maxFailures`. `sleep` is injectable so specs run
  * without wall-clock waits.
  */
object Retry {

  def withRetries[T](maxRetries: Int,
                     extraWaitPerRetry: scala.concurrent.duration.Duration,
                     sleep: Long => Unit = Thread.sleep)
                    (op: => T): T = {
    require(maxRetries >= 0, s"maxRetries must be >= 0, got $maxRetries")
    var attempt = 0
    while (true) {
      try return op
      catch {
        case e: Throwable if attempt < maxRetries && !fatal(e) =>
          attempt += 1
          sleep(extraWaitPerRetry.toMillis * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Don't mask programming errors, JVM errors (OutOfMemoryError,
    * linkage failures — `NonFatal` excludes all `Error`s), or
    * cancellation as transients. */
  private def fatal(e: Throwable): Boolean = e match {
    case _: InterruptedException => true
    case _: IllegalArgumentException => true
    case _: IllegalStateException => true
    case t => !scala.util.control.NonFatal(t)
  }
}
