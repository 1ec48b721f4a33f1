package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based aggregates — the constant-memory path for 100 TB QC
  * (exact distinct counts and exact percentiles need a shuffle of every
  * distinct value; HLL++ and the quantile sketch are one fixed-size
  * buffer per group, merged map-side). The exact columns alongside are
  * for spec-checked error bounds at test scale.
  */
object Sketches {
  def approxStats(df: DataFrame, keys: Seq[Column], distinctOf: Column,
                  v: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(
        approx_count_distinct(distinctOf, rsd = 0.02).as("approx_distinct"),
        countDistinct(distinctOf).as("exact_distinct"),
        // scalar columns (not one array<double>) so every output column is
        // independently sortable/hashable by downstream consumers; the
        // sketch is still built once — Catalyst dedups the two identical
        // percentile_approx buffers into one aggregate expression.
        percentile_approx(v, lit(0.5), lit(10000)).as("p50"),
        percentile_approx(v, lit(0.95), lit(10000)).as("p95"),
        count(lit(1)).as("n"))
}
