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

  /** [[materialize]] + an exact row count matching `pred`, in ONE
    * job (r17): the iterative loops' convergence checks previously
    * ran a second scheduled job per round (`filter(...).count()` over
    * the just-persisted blocks) — here the materializing job itself
    * returns per-partition match counts as its OUTPUT (not an
    * accumulator, whose transformation-side updates double-count
    * under task retry/speculation — these counts drive round counts,
    * which must be bit-deterministic). The mapPartitions pass
    * computes (and thereby caches) each partition, then counts. */
  def materializeCount(df: DataFrame, lvl: StorageLevel,
                       pred: InternalRow => Boolean)
      : (DataFrame, RDD[InternalRow], Long) = {
    val rdd = df.queryExecution.toRdd.map(_.copy()).persist(lvl)
    val matched = rdd
      .mapPartitions(it => Iterator.single(it.count(pred).toLong),
        preservesPartitioning = true)
      .collect().sum
    (org.apache.spark.sql.GraftBridge.internalDF(df.sparkSession, rdd,
      df.schema), rdd, matched)
  }

  /** Small-loop execution profile (r17 — the NnDescent r15 pattern
    * generalized): a CLONED session (`newSession`: same SparkContext
    * and caches, its own SQLConf) narrowed to `parts` shuffle
    * partitions with AQE off, for iterative loops whose per-round data
    * volume is measured-small — there, corpus-width shuffles and AQE's
    * per-stage replanning are pure driver latency multiplied by the
    * round count. Callers gate on a MEASURED size (node/edge/corpus
    * counts they already take), keep their own session above the gate,
    * and re-root the returned plan on the caller's session so
    * downstream consumption plans at full width. Physical knobs only —
    * results are bit-identical either way. */
  def narrowSession(spark: org.apache.spark.sql.SparkSession,
                    parts: Int = 8): org.apache.spark.sql.SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    // broadcast builds over LOCALIZED relations still run one scheduled
    // job (SparkPlan.executeCollectIterator is an RDD collect even for
    // LocalTableScan), and a LocalRelation splits into
    // defaultParallelism slices — on the narrow clone that was 32 tiny
    // tasks per per-round build job (r18 measurement). One slice makes
    // those unavoidable jobs single-task driver round-trips.
    s2.conf.set("spark.sql.leafNodeDefaultParallelism", "1")
    // guide §3.1: let the planner pick shuffled-hash joins — on the
    // clone every per-partition build side is gate-bounded small, and
    // sort-merge's per-round sorts of candidate-pair streams are pure
    // CPU (r18: the NnDescent local join + score joins sort millions
    // of 8-byte pairs per round at width 8)
    s2.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    s2
  }
}
