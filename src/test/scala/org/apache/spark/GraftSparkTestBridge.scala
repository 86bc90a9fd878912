package org.apache.spark

/** Test-only bridge into `private[spark]` surface: lets specs drain the
  * listener bus before reading task metrics, so measured shuffle
  * volumes are complete rather than racing the async event queue. */
object GraftSparkTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
