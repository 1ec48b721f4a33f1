package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based aggregates — the constant-memory path for 100 TB QC
  * (exact distinct counts and exact percentiles need a shuffle of every
  * distinct value; HLL++ and the quantile sketch are one fixed-size
  * buffer per group, merged map-side). Error bounds against the exact
  * answers are pinned in SketchesSpec, which computes the exact
  * distinct count itself — shipping it inside this operator would
  * reintroduce the expand + per-value shuffle the sketch exists to
  * avoid.
  */
object Sketches {
  def approxStats(df: DataFrame, keys: Seq[Column], distinctOf: Column,
                  v: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(
        approx_count_distinct(distinctOf, rsd = 0.02).as("approx_distinct"),
        // ONE quantile sketch per group (two scalar percentile_approx
        // calls are two distinct aggregate buffers — double the sketch
        // cost); scalars are extracted afterwards so every output column
        // stays independently sortable/hashable.
        // accuracy 2000 ≈ 0.05-percentile error — plenty for QC
        // distributions, and the sketch update/merge cost scales with
        // the buffer, which at 100 TB is what bounds the aggregate
        percentile_approx(v, array(lit(0.5), lit(0.95)), lit(2000)).as("_q"),
        count(lit(1)).as("n"))
      .withColumn("p50", element_at(col("_q"), 1))
      .withColumn("p95", element_at(col("_q"), 2))
      .drop("_q")
}
