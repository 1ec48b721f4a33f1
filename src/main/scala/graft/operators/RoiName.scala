package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's ROI/feature-row naming convention — the contract
  * every downstream CellPhe stage joins on (parse_xml.py:195-218
  * builds it, create_frame_summary_features.py:57 merges on it):
  * CellID = TRACK_ID + 1 and FrameID = FRAME + 1 (the reference
  * 1-indexes both for the CellPhe stage), and
  * `ROI_FILENAME = pad(FrameID) + "-" + pad(CellID) + "-" + pad(ID)`
  * where each component is LEFT-ZERO-PADDED to ITS column's maximum
  * digit count over the file — a per-VIDEO width, since the reference
  * runs once per timelapse XML. A reference user's ROI archives and
  * feature CSVs keyed by these names join graft output unchanged.
  *
  * Scale shape: the three pad widths are per-video maxima — window
  * aggregates over the (video) partition, ONE shuffle of the
  * label-grain rows, then a map-side format; nothing collects and
  * no join is introduced. Widths never truncate (a width is the max
  * digit count of its own column, so every value fits), matching
  * pandas `str.pad`, which also only ever lengthens. */
object RoiName {

  /** Append (cell_id, frame_id, roi_filename) to `df`. `track` and
    * `frame` are the 0-indexed TrackMate-grain columns (the +1 is this
    * convention's job, as in the reference); `spot` is the spot ID
    * (not 1-indexed there, and not here). */
  def filenames(df: DataFrame, video: Column, track: Column,
                frame: Column, spot: Column): DataFrame = {
    val w = Window.partitionBy(col("_v"))
    df.withColumn("_v", video)
      .withColumn("cell_id", (track + 1).cast("long"))
      .withColumn("frame_id", (frame + 1).cast("long"))
      .withColumn("_s", spot.cast("long"))
      .withColumn("_wc", length(max(col("cell_id")).over(w).cast("string")))
      .withColumn("_wf", length(max(col("frame_id")).over(w).cast("string")))
      .withColumn("_ws", length(max(col("_s")).over(w).cast("string")))
      .withColumn("roi_filename", concat(
        expr("lpad(CAST(frame_id AS STRING), _wf, '0')"), lit("-"),
        expr("lpad(CAST(cell_id AS STRING), _wc, '0')"), lit("-"),
        expr("lpad(CAST(_s AS STRING), _ws, '0')")))
      .drop("_v", "_s", "_wc", "_wf", "_ws")
  }
}
