package org.apache.spark

/** Bridge into `private[spark]` core internals (the sql sibling is
  * [[org.apache.spark.sql.GraftBridge]]).
  *
  * `drainListeners` flushes the async listener bus so a
  * SparkListener-based metrics snapshot (Bench's per-query shuffle
  * accounting) reads a consistent total — listener events are
  * delivered on a background thread, and a snapshot taken right
  * after an action would otherwise race the last stages' events. */
object GraftCoreBridge {
  def drainListeners(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
