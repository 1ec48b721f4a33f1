package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TrackMate-XML ingest — the reference's ACTUAL wire format
  * (parse_xml.py:68-113 walks `Model/AllSpots/SpotsInFrame/Spot` and
  * `Model/AllTracks/Track/Edge` of the TmXmlWriter output,
  * track_images.py:199-204), parsed distributed with Spark's native
  * `from_xml`: one row per video carries its whole XML document (the
  * reference's per-timelapse file), the nested model parses ONCE into
  * typed arrays the optimizer can prune, and spots/edges explode out
  * as ordinary columns — the same one-parse-then-columns treatment as
  * the JSON ingest ([[Ingest]]), at the real format. At 100 TB the
  * per-video documents are megabytes and parallelism is across
  * videos; nothing ever collects.
  *
  * Only the columns the reference's parse keeps are declared
  * (parse_xml.py:90-103: ID, FRAME, POSITION_X/Y plus the edge
  * source/target/track ids); TrackMate's dozens of other feature
  * attributes prune away unread.
  */
object XmlIngest {

  private val spotType = StructType(Seq(
    StructField("_ID", LongType),
    StructField("_FRAME", LongType),
    StructField("_POSITION_X", DoubleType),
    StructField("_POSITION_Y", DoubleType),
    // the Spot ELEMENT TEXT: TrackMate stores the ROI polygon as
    // space-separated position-relative coordinates here
    // (parse_xml.py:95-99 reads spot.text and offsets by POSITION_X/Y)
    StructField("_VALUE", StringType)))

  private val edgeType = StructType(Seq(
    StructField("_SPOT_SOURCE_ID", LongType),
    StructField("_SPOT_TARGET_ID", LongType)))

  private val spotsInFrameType = StructType(Seq(
    StructField("_frame", LongType),
    StructField("Spot", ArrayType(spotType))))

  private val trackType = StructType(Seq(
    StructField("_TRACK_ID", LongType),
    StructField("Edge", ArrayType(edgeType))))

  /** Schema of the TrackMate model subset the reference reads. */
  val ModelSchema: StructType = StructType(Seq(
    StructField("AllSpots", StructType(Seq(
      StructField("SpotsInFrame", ArrayType(spotsInFrameType))))),
    StructField("AllTracks", StructType(Seq(
      StructField("Track", ArrayType(trackType)))))))

  /** Parse each video's document ONCE: (video, model). Feed the
    * result to [[spots]]/[[rois]]/[[edges]] — a pipeline reading more
    * than one surface should `.persist` this (XML parsing dominates
    * the ingest cost; three surfaces off one unpersisted parse would
    * re-parse per action). */
  def parse(docs: DataFrame, video: org.apache.spark.sql.Column,
            xml: org.apache.spark.sql.Column): DataFrame =
    docs.select(video.as("video"), from_xml(xml, ModelSchema).as("model"))

  private def spotRows(model: DataFrame): DataFrame =
    model
      .select(col("video"),
        explode(col("model.AllSpots.SpotsInFrame")).as("_sif"))
      .select(col("video"), explode(col("_sif.Spot")).as("_s"))

  /** (video, id, frame, x, y) — every spot, from a [[parse]]d model. */
  def spots(model: DataFrame): DataFrame =
    spotRows(model).select(col("video"),
      col("_s._ID").as("id"), col("_s._FRAME").as("frame"),
      col("_s._POSITION_X").as("x"), col("_s._POSITION_Y").as("y"))

  /** (video, id, frame, roi) — each spot's ROI polygon as
    * `array<struct<x double, y double>>` in ABSOLUTE coordinates
    * (relative vertices offset by the spot position, exactly the
    * reference's treatment), ready for [[graft.operators.RoiShape]].
    * Map-only over a [[parse]]d model. */
  def rois(model: DataFrame): DataFrame = {
    val rel = transform(split(trim(col("_s._VALUE")), "\\s+"),
      s => s.cast("double"))
    spotRows(model)
      .select(col("video"),
        col("_s._ID").as("id"), col("_s._FRAME").as("frame"),
        col("_s._POSITION_X").as("px"), col("_s._POSITION_Y").as("py"),
        rel.as("_rel"))
      .filter(size(col("_rel")) >= 6) // a polygon needs 3+ vertices
      .select(col("video"), col("id"), col("frame"),
        transform(sequence(lit(0), (size(col("_rel")) / lit(2)).cast("int") - 1),
          i => struct(
            (element_at(col("_rel"), i * 2 + 1) + col("px")).as("x"),
            (element_at(col("_rel"), i * 2 + 2) + col("py")).as("y")))
          .as("roi"))
  }

  /** (video, track, src, dst) — every track edge, from a [[parse]]d
    * model. */
  def edges(model: DataFrame): DataFrame =
    model
      .select(col("video"), explode(col("model.AllTracks.Track")).as("_t"))
      .select(col("video"), col("_t._TRACK_ID").as("track"),
        explode(col("_t.Edge")).as("_e"))
      .select(col("video"), col("track"),
        col("_e._SPOT_SOURCE_ID").as("src"),
        col("_e._SPOT_TARGET_ID").as("dst"))
}
