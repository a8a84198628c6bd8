package org.apache.spark

/** Same-package bridge to `private[spark]` internals the public API does
  * not expose. Kept to the absolute minimum: one deterministic
  * listener-bus drain used by `graft.exec.CopyMonitor` so post-job metric
  * snapshots don't rely on a timed settle.
  */
object GraftSparkInternals {

  /** Block until every event queued on the live listener bus has been
    * delivered, or `timeoutMs` elapses. Returns false on timeout or if
    * the bus refuses the wait (e.g. a stopping context) — callers fall
    * back to their own settle.
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: Exception => false }
}
