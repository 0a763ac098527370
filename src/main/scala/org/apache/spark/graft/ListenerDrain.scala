package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into Spark's `private[spark]` listener bus: task-metric
  * listeners are posted asynchronously, so a benchmark reading an
  * accumulated metric right after an action races the bus. Draining it
  * first makes the read exact. (Standard extension-package idiom; no
  * Spark internals are modified.)
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
