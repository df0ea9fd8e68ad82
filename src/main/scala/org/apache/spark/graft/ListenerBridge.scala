package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` access shim (the [[org.apache.spark.sql.graft
  * .ColumnBridge]] pattern) for the listener bus: the skew audit's
  * collector rides the ASYNC listener bus, so both epoch boundaries —
  * clearing before the audited rep and snapshotting after it — must
  * wait for the bus to drain or stragglers from the previous rep's
  * jobs leak across the boundary (a fixed post-sleep only covered the
  * snapshot side; a straggler arriving after `clear()` contaminated
  * the audited epoch and could flag spurious skew).
  */
object ListenerBridge {
  /** Block until every queued listener event has been delivered, or
    * the timeout elapses (never throws — an audit boundary should
    * degrade to the old sleep-like behavior, not kill the sweep).
    */
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case scala.util.control.NonFatal(_) => () }
}
