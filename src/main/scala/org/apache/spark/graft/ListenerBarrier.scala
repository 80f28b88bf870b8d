package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Accessor shim for the `private[spark]` listener bus: the scale
  * probe needs a drain barrier between per-query measurements because
  * `AsyncEventQueue` delivers BACKLOGGED events (posted before a
  * listener registered) to newly-added listeners — under a 32-core
  * task-event flood that mis-attributes one query's late stage
  * completions to the next query's meter (measured: a 1-row audit
  * query "inheriting" 700 MB of its predecessor's shuffle reads).
  * Probe-side tooling only; never on a serving path.
  */
object ListenerBarrier {
  /** Block until every queued listener event has been dispatched. */
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(60000L)
}
