package graft

import org.apache.spark.sql.functions._

import graft.operators.{KalmanLink, LapLink, SpotLink, TrackAssignment, TrackerConfig}

class TrackerConfigSpec extends SparkSpec {
  import spark.implicits._

  private val vid: Long => Long = _ / 1000L

  // two videos, a few frames, one division-ish pattern, one AREA column
  private def spots = Seq(
    (1001L, 0L, 10.0, 10.0, 5.0), (1002L, 1L, 12.0, 11.0, 5.2),
    (1003L, 2L, 14.0, 12.0, 5.1), (1004L, 4L, 18.0, 14.0, 5.3),
    (1007L, 5L, 20.0, 15.0, 5.2), // 1004-1007 form the rejoinable segment
    (1005L, 0L, 50.0, 50.0, 9.0), (1006L, 1L, 51.0, 52.0, 9.1),
    (2001L, 0L, 5.0, 5.0, 3.0), (2002L, 1L, 6.0, 6.0, 3.1),
    (2003L, 2L, 7.0, 7.0, 3.0)
  ).toDF("id", "frame", "x", "y", "AREA")

  private def collectTracks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id").cast("long"), col("track_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("a cyto3-shaped SparseLAP template reproduces the direct call chain") {
    val template = """{
      "run": {"tracking": true},
      "tracking": {
        "algorithm": "SparseLAP",
        "settings": {
          "LINKING_MAX_DISTANCE": 10.0,
          "LINKING_FEATURE_PENALTIES": {"AREA": 0.5},
          "ALLOW_GAP_CLOSING": true,
          "MAX_FRAME_GAP": 3,
          "GAP_CLOSING_MAX_DISTANCE": 12.0,
          "ALLOW_TRACK_MERGING": true,
          "ALTERNATIVE_LINKING_COST_FACTOR": 1.05
        }
      },
      "QC": {"minimum_observations": 50}
    }"""
    val got = collectTracks(TrackerConfig.tracks(spots, template, vid))
    // the factor key conditions BOTH phases of the direct chain:
    // linking at TrackMate's hardcoded percentile 1.0, gap closing at
    // the CUTOFF_PERCENTILE default 0.9
    val edges = LapLink.frameToFrame(spots, col("id"), col("frame"),
      col("x"), col("y"), 10.0, Seq((col("AREA"), 0.5)),
      altCostFactor = Some(1.05))
    val want = collectTracks(TrackAssignment.divisionAwareGapClosedByVideo(
      spots, edges.select("src", "dst"), 12.0, 3, vid,
      altCostFactor = Some(1.05), cutoffPercentile = 0.9))
    assert(got === want && got.nonEmpty)
    // the gap-closed chain rejoined the frame-4 spot to its track
    val byId = got.toMap
    assert(byId(1004L) === byId(1001L))
  }

  test("SimpleSparseLAP ignores penalties, as in TrackMate") {
    val simple = """{"algorithm": "SimpleSparseLAP", "settings": {
      "LINKING_MAX_DISTANCE": 10.0,
      "LINKING_FEATURE_PENALTIES": {"AREA": 99.0},
      "GAP_CLOSING_MAX_DISTANCE": 12.0, "MAX_FRAME_GAP": 3}}"""
    val got = collectTracks(TrackerConfig.tracks(spots, simple, vid))
    val edges = LapLink.frameToFrame(spots, col("id"), col("frame"),
      col("x"), col("y"), 10.0)
    val want = collectTracks(TrackAssignment.divisionAwareGapClosedByVideo(
      spots, edges.select("src", "dst"), 12.0, 3, vid))
    assert(got === want)
  }

  test("NearestNeighbor and Kalman dispatch with their own keys") {
    val nn = """{"algorithm": "NearestNeighbor",
      "settings": {"LINKING_MAX_DISTANCE": 10.0}}"""
    assert(collectTracks(TrackerConfig.tracks(spots, nn, vid)) ===
      collectTracks(TrackAssignment.nearestTracksByVideo(spots, 10.0, 1, vid)))
    val kf = """{"algorithm": "Kalman", "settings": {
      "KALMAN_SEARCH_RADIUS": 11.0, "MAX_FRAME_GAP": 3}}"""
    assert(collectTracks(TrackerConfig.tracks(spots, kf, vid)) ===
      collectTracks(KalmanLink.tracks(spots, col("id"), col("frame"),
        col("x"), col("y"), 11.0, 3, vid)))
  }

  test("Overlap dispatches over box columns") {
    val boxes = spots.select(col("id"), col("frame"),
      col("x"), col("y"),
      (col("x") - 2.0).as("x0"), (col("x") + 2.0).as("x1"),
      (col("y") - 2.0).as("y0"), (col("y") + 2.0).as("y1"))
    val ov = """{"algorithm": "Overlap",
      "settings": {"MIN_IOU": 0.2, "GRID_CELL_SIZE": 20.0}}"""
    val got = collectTracks(TrackerConfig.tracks(boxes, ov, vid))
    val edges = SpotLink.overlap(boxes, col("id"), col("frame"),
      col("x0"), col("x1"), col("y0"), col("y1"), 0.2, 20.0)
    val want = collectTracks(
      TrackAssignment.divisionAwareByVideo(boxes, edges.select("src", "dst"), vid))
    assert(got === want && got.nonEmpty)
  }

  test("lineage surfaces split/merge edges per the template flags") {
    val template = """{"algorithm": "SparseLAP", "settings": {
      "LINKING_MAX_DISTANCE": 10.0, "GAP_CLOSING_MAX_DISTANCE": 12.0,
      "MAX_FRAME_GAP": 3, "ALLOW_TRACK_SPLITTING": true,
      "ALLOW_TRACK_MERGING": true}}"""
    val got = TrackerConfig.lineage(spots, template, vid)
      .select("src", "dst", "kind").as[(Long, Long, String)].collect().toSet
    val edges = LapLink.frameToFrame(spots, col("id"), col("frame"),
      col("x"), col("y"), 10.0)
    val labels = TrackAssignment.divisionAwareByVideo(
      spots, edges.select("src", "dst"), vid)
    val want = LapLink.gapCloseFull(spots, labels, col("id"), col("frame"),
        col("x"), col("y"), 12.0, 3, vid, allowSplit = true, allowMerge = true)
      .select("src", "dst", "kind").as[(Long, Long, String)].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("the template's QC block dispatches size and observation floors") {
    val qc = Seq(
      (1L, 60.0), (1L, 55.0), (1L, 70.0),   // track 1: 3 rows over size
      (2L, 80.0), (2L, 40.0),               // track 2: 1 row left -> dropped
      (3L, 30.0), (3L, 20.0)                // track 3: all under size
    ).toDF("track", "area")
    val cfgJson = """{"QC": {"minimum_observations": 2,
      "minimum_cell_size": 50}}"""
    val got = TrackerConfig.qcFilter(qc, cfgJson, "track", col("area"))
      .select("track").as[Long].collect().toSeq
    assert(got === Seq(1L, 1L, 1L))
    // defaults (50/50) mirror the reference templates
    val dflt = TrackerConfig.qcFilter(qc, """{}""", "track", col("area"))
    assert(dflt.count() === 0L)
  }

  test("GAP_CLOSING_FEATURE_PENALTIES binds the label path's relabel " +
      "pass: a penalty-driven gap-close flip that tracks() and lineage() " +
      "agree on") {
    // one video, three frame-linked segments: A ends at 102 (AREA 10);
    // candidate starts 201 (nearer, d2=4, AREA 100) and 301 (farther,
    // d2=9, AREA 10), both inside the gap gate (4.0 -> maxD2=16)
    val sp = Seq(
      (101L, 0L, 0.0, 0.0, 10.0), (102L, 1L, 1.0, 0.0, 10.0),
      (201L, 3L, 3.0, 0.0, 100.0), (202L, 4L, 4.0, 0.0, 100.0),
      (301L, 3L, 1.0, 3.0, 10.0), (302L, 4L, 1.0, 4.0, 10.0)
    ).toDF("id", "frame", "x", "y", "AREA")
    def template(pen: String) = s"""{
      "tracking": {"algorithm": "SparseLAP", "settings": {
        "LINKING_MAX_DISTANCE": 5.0,
        "ALLOW_GAP_CLOSING": true,
        "GAP_CLOSING_MAX_DISTANCE": 4.0,
        "MAX_FRAME_GAP": 2,
        "GAP_CLOSING_FEATURE_PENALTIES": $pen,
        "ALLOW_TRACK_SPLITTING": false,
        "ALLOW_TRACK_MERGING": false,
        "ALTERNATIVE_LINKING_COST_FACTOR": 1.05,
        "CUTOFF_PERCENTILE": 0.9
      }}}"""
    def trackOf(m: Map[Long, Long], id: Long) = m(id)
    def gcLinks(cfg: String): Set[(Long, Long)] =
      TrackerConfig.lineage(sp, cfg, vid)
        .filter(col("kind") === "gc")
        .select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)].collect().toSet

    // empty map: the geometrically nearer start wins (cost 4 < 9)
    val plain = collectTracks(TrackerConfig.tracks(sp, template("{}"), vid)).toMap
    assert(trackOf(plain, 102L) == trackOf(plain, 201L),
      "without penalties the nearer start joins A")
    assert(trackOf(plain, 102L) != trackOf(plain, 301L))
    assert(gcLinks(template("{}")) == Set((102L, 201L)))

    // {"AREA": 1.0}: 102->201's penalized cost 4*(1 + 3*90/110)^2 ~ 48
    // exceeds the gate (16), so it falls out of the block entirely and
    // the same-area farther start 301 (cost 9) wins — in the RELABEL
    // pass and in lineage's gap block alike
    val penCfg = template("""{"AREA": 1.0}""")
    val pen = collectTracks(TrackerConfig.tracks(sp, penCfg, vid)).toMap
    assert(trackOf(pen, 102L) == trackOf(pen, 301L),
      "the penalty must flip the close to the same-area start")
    assert(trackOf(pen, 102L) != trackOf(pen, 201L))
    assert(gcLinks(penCfg) == Set((102L, 301L)),
      "lineage's gap block must agree with the relabel pass")
  }

  test("an unknown algorithm throws listing the menu") {
    val bad = """{"algorithm": "Magic", "settings": {}}"""
    val ex = intercept[IllegalArgumentException] {
      TrackerConfig.tracks(spots, bad, vid)
    }
    assert(ex.getMessage.contains("SimpleSparseLAP") &&
      ex.getMessage.contains("Magic"))
  }
}
