package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.storage.StorageLevel

/** Shared machinery for iterative DataFrame algorithms (connected
  * components, chain labeling): each round's plan is truncated by
  * re-rooting on a persisted InternalRow RDD, keeping Catalyst's
  * optimization time constant per round instead of geometric in the
  * round count, with the block lifecycle under caller control (unlike
  * `localCheckpoint`, whose blocks only GC frees). */
private[graft] object Rounds {
  /** UnsafeRows are reused by the scanner, so copy before persisting
    * (the localCheckpoint trick). */
  def materialize(df: DataFrame, lvl: StorageLevel)
      : (DataFrame, RDD[InternalRow]) = {
    val rdd = df.queryExecution.toRdd.map(_.copy()).persist(lvl)
    (org.apache.spark.sql.GraftBridge.internalDF(df.sparkSession, rdd, df.schema), rdd)
  }
}
