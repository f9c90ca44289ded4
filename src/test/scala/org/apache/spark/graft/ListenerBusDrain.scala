package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to `SparkContext.listenerBus` (private[spark]):
  * deterministically drains the async listener bus instead of sleeping a
  * fixed interval — under CI load a job-start tail can arrive after any
  * fixed sleep, which made job-count assertions flaky (BpeSpec). */
object ListenerBusDrain {
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
