package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Dev-tool shim (used only by `graft.tools` stress/profile mains, never
  * by library code): deterministic listener-bus drain for per-stage
  * metric attribution. `SparkContext.listenerBus` is `private[spark]`,
  * so the accessor must live under the `org.apache.spark` package — the
  * standard workaround for test/measurement code. The stress tools'
  * previous fixed 300 ms sleep under-drained at 100x corpus scale (a
  * 584-task stage's completion events arrived AFTER the sleep, crediting
  * their CPU to the next stage's window).
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
