package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into the `private[spark]` listener bus so `Bench --profile`
  * can WAIT for the async bus to drain between queries instead of
  * sleeping a fixed 150 ms — under load, late task-end events from one
  * query otherwise bleed into the next query's jobs/stages/tasks
  * counters, skewing exactly the per-query attribution the flag exists
  * to provide. Lives in the `org.apache.spark` package tree solely to
  * see the `private[spark]` member; no Spark internals are modified.
  */
object ListenerBridge {
  /** Block until every event posted so far has been delivered to every
    * registered listener. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
