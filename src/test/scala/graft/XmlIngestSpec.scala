package graft

import org.apache.spark.sql.functions._

import graft.sources.XmlIngest

class XmlIngestSpec extends SparkSpec {
  import spark.implicits._

  // a TmXmlWriter-shaped model document (attribute names and nesting
  // exactly as TrackMate writes them; extra attributes prune away)
  private def model(spots: Seq[(Long, Long, Double, Double)],
                    tracks: Seq[(Long, Seq[(Long, Long)])]): String = {
    val byFrame = spots.groupBy(_._2).toSeq.sortBy(_._1)
    val spotXml = byFrame.map { case (f, ss) =>
      s"""<SpotsInFrame frame="$f">""" + ss.map { case (id, fr, x, y) =>
        // element text = the ROI, position-relative (a 2x2 square)
        s"""<Spot ID="$id" name="ID$id" FRAME="$fr" POSITION_X="$x" POSITION_Y="$y" QUALITY="1.0" RADIUS="5.0">-1.0 -1.0 1.0 -1.0 1.0 1.0 -1.0 1.0</Spot>"""
      }.mkString + "</SpotsInFrame>"
    }.mkString
    val trackXml = tracks.map { case (tid, es) =>
      s"""<Track TRACK_ID="$tid" NUMBER_SPOTS="${es.size + 1}">""" + es.map {
        case (s, d) =>
          s"""<Edge SPOT_SOURCE_ID="$s" SPOT_TARGET_ID="$d" LINK_COST="1.0"/>"""
      }.mkString + "</Track>"
    }.mkString
    s"""<Model spatialunits="pixel"><AllSpots nspots="${spots.size}">$spotXml</AllSpots><AllTracks>$trackXml</AllTracks></Model>"""
  }

  private val v1Spots = Seq((1L, 0L, 10.0, 11.0), (2L, 1L, 12.5, 11.5),
    (3L, 1L, 8.0, 9.0), (4L, 2L, 13.0, 12.0))
  private val v1Tracks = Seq((0L, Seq((1L, 2L), (1L, 3L), (2L, 4L))))
  private val v2Spots = Seq((10L, 0L, 1.0, 1.0), (11L, 1L, 2.0, 2.0))
  private val v2Tracks = Seq((7L, Seq((10L, 11L))))

  private def docs = Seq(
    (100L, model(v1Spots, v1Tracks)),
    (200L, model(v2Spots, v2Tracks))
  ).toDF("video", "xml")

  private def parsedModel = XmlIngest.parse(docs, col("video"), col("xml"))

  test("spots explode out of the nested model, typed") {
    val got = XmlIngest.spots(parsedModel)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    val want = (v1Spots.map(s => (100L, s._1, s._2, s._3, s._4)) ++
      v2Spots.map(s => (200L, s._1, s._2, s._3, s._4))).toSet
    assert(got === want)
  }

  test("track edges explode with their track ids") {
    val got = XmlIngest.edges(parsedModel)
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = (v1Tracks.flatMap { case (t, es) =>
      es.map(e => (100L, t, e._1, e._2)) } ++
      v2Tracks.flatMap { case (t, es) => es.map(e => (200L, t, e._1, e._2)) }).toSet
    assert(got === want)
  }

  test("ROIs come out position-offset and feed the shape features") {
    val roi = XmlIngest.rois(parsedModel)
    val first = roi.filter($"video" === 100L && $"id" === 1L)
      .select(explode($"roi").as("p")).select("p.x", "p.y")
      .as[(Double, Double)].collect().toSet
    // the 2x2 relative square offset by POSITION (10, 11)
    assert(first === Set((9.0, 10.0), (11.0, 10.0), (11.0, 12.0), (9.0, 12.0)))
    val feats = graft.operators.RoiShape.features(roi, $"roi")
      .select("area", "perimeter", "bbox_w", "bbox_h")
      .as[(Double, Double, Double, Double)].collect()
    assert(feats.nonEmpty && feats.forall(_ == ((4.0, 8.0, 2.0, 2.0))))
  }

  test("parsed edges drive the division-aware labeler like any edge table") {
    val sp = XmlIngest.spots(parsedModel)
      .select(($"video" * 1000L + $"id").as("id"),
        $"frame", $"x", $"y")
    val ed = XmlIngest.edges(parsedModel)
      .select(($"video" * 1000L + $"src").as("src"),
        ($"video" * 1000L + $"dst").as("dst"))
    val labels = graft.operators.TrackAssignment.divisionAwareByVideo(
      sp, ed, _ / 1000L)
    val byId = labels.as[(Long, Long)].collect().toMap
    // video 1: spot 2 continues track of 1 (first child), 3 starts new,
    // 4 continues 2's track
    assert(byId(100001L) === byId(100002L) && byId(100002L) === byId(100004L))
    assert(byId(100003L) !== byId(100001L))
    assert(byId(200010L) === byId(200011L))
  }
}
