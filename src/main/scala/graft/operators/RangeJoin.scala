package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: attach to each fact row the interval
  * [lo, hi) that contains its value. Naively this is a non-equi join —
  * BroadcastNestedLoop when one side is small, quadratic when both are
  * big. The scale formulation bins both sides on floor(v/binW): every
  * interval is exploded to the bins it overlaps, the join becomes an
  * equi-join on the bin, and the residual range predicate filters
  * within-bin. Cost: |facts| + sum(interval spans / binW), shuffled on
  * the bin key only.
  */
object RangeJoin {
  /** @param facts  fact rows; `v` is the probe value
    * @param ranges (lo, hi, ...payload) interval rows, lo inclusive,
    *               hi exclusive
    * @param binW   bin width (close to typical interval width) */
  def binned(facts: DataFrame, ranges: DataFrame, v: Column, binW: Double): DataFrame = {
    val binnedFacts = facts.withColumn("_bin", floor(v / binW).cast("long"))
    val explodedRanges = ranges
      .withColumn("_bin", explode(sequence(
        floor(col("lo") / binW).cast("long"),
        // hi is exclusive: the last overlapped bin is floor((hi - ulp)/binW);
        // using hi/binW and filtering handles exact-boundary his cheaply
        floor(col("hi") / binW).cast("long"))))
    binnedFacts.join(explodedRanges, Seq("_bin"))
      .filter(v >= col("lo") && v < col("hi"))
      .drop("_bin")
  }
}
