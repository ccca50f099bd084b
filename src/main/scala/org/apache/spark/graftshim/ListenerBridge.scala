package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Package-private-bridging shim (the `ColumnBridge` pattern):
  * `SparkContext.listenerBus` is `private[spark]`, but the bench's
  * data-movement lane needs `waitUntilEmpty` to drain the async event
  * queue between queries — otherwise a stage-completed event from query
  * N can land after query N+1's counter snapshot and mis-attribute its
  * shuffle bytes. The bus and its wait are public at the bytecode level
  * and stable across the 3.x/4.x line. */
object ListenerBridge {
  /** Block until every queued listener event is dispatched (bounded;
    * a timeout is swallowed — metrics attribution degrades gracefully
    * instead of failing the bench). */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
