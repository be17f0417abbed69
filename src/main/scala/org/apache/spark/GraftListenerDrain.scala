package org.apache.spark

/** Access shim: `SparkContext.listenerBus` and
  * `LiveListenerBus.waitUntilEmpty` are `private[spark]`. The bench
  * snapshots per-query WORK metrics (rows read, shuffle bytes, task
  * count) from a SparkListener, and listener events are delivered
  * asynchronously — without a deterministic drain the snapshot races
  * the queue and the work numbers jitter, defeating their purpose as
  * the noise-immune regression signal.
  */
object GraftListenerDrain {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
