package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Numeric._

/** QC operators from the reference's filtering + report stages. */
object Quality {

  /** `filter_size_and_observations` (reference: main.nf:165-190):
    * keep rows with measure >= minSize, then keep only tracks that still
    * have >= minObs observations. The R original is filter + group_by +
    * filter(n()); here the group count is a window aggregate over the
    * already-filtered rows — no self-join, one shuffle on the track key.
    */
  def filterSizeAndObservations(df: DataFrame, entity: String, measure: Column,
                                minSize: Double, minObs: Long): DataFrame = {
    val kept = df.filter(measure >= minSize)
    kept.withColumn("_n", count(lit(1)).over(Window.partitionBy(col(entity))))
      .filter(col("_n") >= minObs)
      .drop("_n")
  }

  /** Track summary stats (reference: bin/tracking_qc.qmd — per-track
    * n/min/median/max tables). */
  def trackSummary(df: DataFrame, entity: String, ts: Column, v: Column): DataFrame =
    df.groupBy(col(entity))
      .agg(
        count(lit(1)).as("n_obs"),
        min(unix_timestamp(ts)).as("first_s"),
        max(unix_timestamp(ts)).as("last_s"),
        (max(unix_timestamp(ts)) - min(unix_timestamp(ts))).as("span_s"),
        cround(min(v), 4).as("v_min"),
        cround(max(v), 4).as("v_max"),
        davg(v, 4, 4).as("v_avg"))

  /** Duplicate detection (reference: bin/tracking_qc.qmd — multiple
    * cells sharing (FRAME, TRACK_ID) make a track ambiguous). */
  def duplicates(df: DataFrame, entity: String, frame: Column): DataFrame =
    df.groupBy(col(entity), frame.as("frame"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Cells-per-frame distribution (reference: segmentation_qc.qmd —
    * "cell counts per frame" table: n frames, min/median/max of the
    * per-frame count). Median over INTEGER counts is cross-engine exact
    * ((a+b)/2 of integers has no rounding ambiguity). */
  def cellsPerFrame(df: DataFrame, group: Column, frame: Column): DataFrame =
    df.groupBy(group.as("grp"), frame.as("frame"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_frames"),
        min(col("n")).as("min_n"),
        expr("percentile(n, 0.5)").as("median_n"),
        max(col("n")).as("max_n"))

  /** Grouped descriptive stats (reference: segmentation_qc.qmd area
    * stats + CellPhe static intensity summaries). */
  def frameStats(df: DataFrame, keys: Seq[Column], v: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        dsum(v, 4).as("v_sum"),
        davg(v, 4, 4).as("v_avg"),
        dstddev(v, 4, 4).as("v_std"),
        cround(min(v), 4).as("v_min"),
        cround(max(v), 4).as("v_max"))
}
