package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** One-shot cleanup for operator-internal persists.
  *
  * Several operators persist an intermediate to share it between an
  * internal driver-side materialization (a count/collect that sizes a
  * filter or a prefix table) and the plan they return — layoutBy's
  * per-partition ranks, IncrementalDedup's corpus index. The persist
  * must OUTLIVE the operator call (the returned plan still reads it),
  * so the operator cannot unpersist before returning; but leaving it
  * cached forever accumulates blocks in a long-lived session.
  *
  * [[afterNextExecution]] unpersists the intermediate after the NEXT
  * query execution on its session completes (success or failure) —
  * normally the caller materializing the returned plan, which is the
  * last reader. Semantics are best-effort, never unsafe: unpersisting
  * only drops the cache, the lineage stays valid, so an early release
  * (an unrelated query running first) or a caller that materializes
  * the result twice costs a recompute, not correctness. Callers that
  * re-materialize repeatedly should persist the RESULT themselves.
  */
object CacheRelease {

  /** Unpersist `cached` after the next `uses` query executions on its
    * session finish, then deregister the listener (exactly-once).
    * `uses` > 1 serves operators returning several DataFrames off one
    * cached parse (e.g. a clean/quarantine split the caller writes as
    * two actions). */
  def afterNextExecution(cached: DataFrame, uses: Int = 1): Unit = {
    require(uses >= 1, "uses must be >= 1")
    val spark = cached.sparkSession
    val remaining = new java.util.concurrent.atomic.AtomicInteger(uses)
    val listener = new QueryExecutionListener {
      private def countDown(self: QueryExecutionListener): Unit =
        if (remaining.decrementAndGet() == 0) {
          try cached.unpersist(blocking = false)
          finally spark.listenerManager.unregister(self)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = countDown(this)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = countDown(this)
    }
    spark.listenerManager.register(listener)
  }
}
