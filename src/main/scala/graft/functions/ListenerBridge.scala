/* listenerBus is private[spark]; benchmarking needs to drain it before
 * snapshotting task-metric counters (events post asynchronously). Same
 * minimal-shim approach as GraftSqlBridge. */
package org.apache.spark

object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000) catch { case _: Throwable => () }
}
