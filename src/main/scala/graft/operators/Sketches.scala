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

  /** INCREMENTAL distinct counting via persistable, MERGEABLE HLL
    * sketches (Apache DataSketches HllSketch, Spark's
    * `hll_sketch_agg` family) — the analytics member of the
    * incremental family (22a dedup, 24c near-dup, 27i4 graph, 27m2
    * IVF, 23e clusters): each ingest batch reduces to ONE fixed-size
    * binary sketch row per group, persisted next to the corpus, and
    * any batch-range's distinct count is a UNION of its sketches —
    * no corpus rescan, ever. Union is lossless at equal lgK (the
    * registers take an elementwise max), so the merged estimate is
    * BIT-EQUAL to a one-shot sketch over the concatenated data —
    * SketchesSpec pins that exactly, plus the standard error bound
    * vs the exact count and a parquet round-trip of the binary
    * column. [[approxStats]]' `approx_count_distinct` answers one
    * query now; these sketches are the ARTIFACT form — yesterday's
    * rollup never recomputes. */
  def sketchBy(df: DataFrame, keys: Seq[Column], of: Column,
               lgK: Int = 12): DataFrame =
    df.groupBy(keys: _*).agg(hll_sketch_agg(of, lit(lgK)).as("hll"))

  /** Merge sketches down to `keys` grain, KEEPING the sketch form —
    * the rollup-artifact maintenance step: yesterday's rollup row
    * unions with today's batch sketch into today's rollup, same
    * schema as [[sketchBy]], so the incremental chain composes
    * indefinitely without touching raw data. */
  def unionSketches(sketches: DataFrame, keys: Seq[Column]): DataFrame =
    sketches.groupBy(keys: _*)
      .agg(hll_union_agg(col("hll"), lit(false)).as("hll"))

  /** Merge persisted sketches down to `keys` grain and estimate:
    * (keys..., n_parts, approx_distinct). */
  def unionEstimate(sketches: DataFrame, keys: Seq[Column]): DataFrame =
    sketches.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_parts"),
        hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
          .as("approx_distinct"))
}
