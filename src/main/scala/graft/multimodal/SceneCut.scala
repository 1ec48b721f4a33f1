package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Video temporal segmentation — the clip-extraction step a video
  * training pipeline runs before captioning/embedding: consecutive
  * sampled frames whose intensity jumps past a threshold mark scene
  * cuts. Operates on the OUTPUT of the batched frame-feature decode
  * (per-frame rows, not payloads), so the window shuffles a few
  * doubles per frame — the asset bytes crossed the wire once in the
  * decode pass and never again. One window over (doc_id, frame_idx);
  * at scale this partitions by asset exactly like every other
  * per-entity lineage computation here.
  */
object SceneCut {

  /** Flag scene cuts in a frame-feature table (doc_id, frame_idx,
    * mean_px, ...). Returns every frame with its intensity delta to
    * the previous sampled frame (NULL on each asset's first frame) and
    * the cut flag; `segment` numbers the scenes per asset (count of
    * cuts so far — a running sum over the cut flags in the same
    * window pass lineage). */
  def cuts(frames: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("delta",
        col("mean_px") - lag(col("mean_px"), 1).over(w))
      .withColumn("is_cut",
        coalesce(abs(col("delta")) > threshold, lit(false)))
      .withColumn("segment",
        sum(col("is_cut").cast("int")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("frame_idx"), col("delta"),
        col("is_cut"), col("segment"))
  }
}
