package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ROI polygon shape features — the reference's static shape
  * descriptor family (bin/frame_features_image.py:34-66) over the
  * per-spot ROI coordinate arrays parse_xml.py:90-101 extracts:
  * area, perimeter, circularity (4*pi*A/P^2, 1.0 for a circle), and
  * bounding-box width/height/aspect. One codegen'd pass per row
  * (functions.PolygonShape) plus scalar arithmetic — map-only, no
  * shuffle, so at 100 TB this is scan-bound like any other projection.
  */
object RoiShape {

  /** Appends n_vertices / area / perimeter / circularity / bbox_w /
    * bbox_h / aspect (raw, unrounded doubles) for the given
    * `array<struct<x double, y double>>` ROI column. */
  def features(df: DataFrame, roi: Column): DataFrame =
    withShape(df, roi).drop("_shape")

  private def withShape(df: DataFrame, roi: Column): DataFrame = {
    df.withColumn("_shape", graft.functions.PolygonShape(roi))
      .withColumn("n_vertices", size(roi))
      .withColumn("area", col("_shape.area"))
      .withColumn("perimeter", col("_shape.perimeter"))
      .withColumn("circularity",
        when(col("_shape.perimeter") > 0.0,
          lit(4.0 * math.Pi) * col("_shape.area") /
            (col("_shape.perimeter") * col("_shape.perimeter")))
          .otherwise(lit(0.0)))
      .withColumn("bbox_w", col("_shape.max_x") - col("_shape.min_x"))
      .withColumn("bbox_h", col("_shape.max_y") - col("_shape.min_y"))
      .withColumn("aspect",
        when(col("_shape.max_y") - col("_shape.min_y") > 0.0,
          (col("_shape.max_x") - col("_shape.min_x")) /
            (col("_shape.max_y") - col("_shape.min_y")))
          .otherwise(lit(0.0)))
  }

  /** TrackMate Spot 2D shape-descriptor parity (r14) — the remaining
    * geometry columns of parse_xml.py's output CSV (its col_order
    * lists AREA/PERIMETER/CIRCULARITY/SOLIDITY/SHAPE_INDEX plus the
    * equivalent RADIUS, all emitted by TrackMate's
    * Spot2DShapeAnalyzer, which track_images.py:166-167 registers
    * explicitly): [[features]]' columns plus
    *  - `shape_index`  = perimeter / sqrt(area),
    *  - `radius`       = sqrt(area / pi) (the equivalent-area disk —
    *    what the LabelImageDetector puts in the RADIUS column),
    *  - `solidity`     = area / convex-hull area (monotone-chain hull
    *    inside the same codegen'd PolygonShape pass; 0.0 for
    *    degenerate hulls).
    * The intensity columns of the CSV (MEAN/…/STD_INTENSITY_CH1,
    * CONTRAST, SNR) need pixel data and live behind the declared
    * multimodal decode stub — geometry ends here by construction. */
  def trackmateDescriptors(df: DataFrame, roi: Column): DataFrame = {
    withShape(df, roi)
      .withColumn("shape_index",
        when(col("area") > 0.0, col("perimeter") / sqrt(col("area")))
          .otherwise(lit(0.0)))
      .withColumn("radius", sqrt(col("area") / math.Pi))
      .withColumn("solidity",
        when(col("_shape.hull_area") > 0.0,
          col("area") / col("_shape.hull_area")).otherwise(lit(0.0)))
      .drop("_shape")
  }

  /** Deterministic synthetic ROI for the driver's events table (the
    * container has no imaging stack, so ROI coordinates are derived
    * from each event instead of segmentation output — mirrored exactly
    * by the DuckDB oracle): a star-shaped polygon of k = 4 + id%5
    * vertices around (x, y), walking the 8 compass directions with
    * integer radius 1 + (id + i)%3 (radius period 3 is chosen so no
    * (k, id) combination collapses to a zero-area bowtie — period 4
    * does for k = 4). Integer-derived doubles, so both engines build
    * bit-identical vertices. */
  def syntheticRoi(id: Column, x: Column, y: Column): Column =
    graft.functions.SyntheticRoi(id, x, y)
}
