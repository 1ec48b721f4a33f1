package graft

import org.apache.spark.sql.functions._

import graft.operators.{LapLink, TrackAssignment, TrackerConfig}

/** Table-driven parity over the reference's FULL public template
  * inventory (the templates dir ships ten microscope configs — SAM,
  * cyto3, three iolight revisions, two livecyte variants, openflexure
  * and two tomocube combinations). Every one of them carries the same
  * tracking STRUCTURE: algorithm "SparseLAP" plus the 14-key
  * TrackerKeys settings surface — the three ALLOW flags, three
  * per-block distance gates (gap/split/merge set DIFFERENTLY), the
  * frame-gap bound, four per-block feature-penalty objects (the
  * merging one non-empty), and the Jaqaman conditioning keys
  * (ALTERNATIVE_LINKING_COST_FACTOR, CUTOFF_PERCENTILE — applied on
  * every dispatch surface: factor·max per frame-pair matrix in the
  * linking phase, TrackMate's hardcoded percentile 1d; factor ·
  * interpolated CUTOFF_PERCENTILE in the segment phase, where they
  * reject outlier-cost links). This spec synthesizes ten templates of exactly that
  * structure (values vary per row; the files themselves are not
  * embedded) and pins both dispatch surfaces against the direct call
  * chain, so any reference template's tracking section runs
  * unmodified. */
class TrackerTemplateSpec extends SparkSpec {
  import spark.implicits._

  private val vid: Long => Long = _ / 1000L

  // two videos, a rejoinable gap, a split-shaped fork, an AREA column
  private def spots = Seq(
    (1001L, 0L, 10.0, 10.0, 5.0), (1002L, 1L, 12.0, 11.0, 5.2),
    (1003L, 2L, 14.0, 12.0, 5.1), (1004L, 4L, 18.0, 14.0, 5.3),
    (1007L, 5L, 20.0, 15.0, 5.2),
    (1005L, 0L, 50.0, 50.0, 9.0), (1006L, 1L, 51.0, 52.0, 9.1),
    // fork: 1009 starts next to A's frame-3 middle (1008) and walks
    // away with 1010 — the 1-1 front end leaves it unmatched (1004 is
    // closer), so the second phase's split block must claim it
    (1008L, 3L, 16.5, 13.5, 5.0), (1009L, 4L, 17.0, 17.0, 5.1),
    (1010L, 5L, 17.5, 20.5, 5.0),
    (2001L, 0L, 5.0, 5.0, 3.0), (2002L, 1L, 6.0, 6.0, 3.1),
    (2003L, 2L, 7.0, 7.0, 3.0)
  ).toDF("id", "frame", "x", "y", "AREA")

  /** One synthesized template per reference file, full 14-key surface.
    * (name, link, gap, split, merge dists, maxGap, linkPenalty on AREA,
    * mergePenalty on AREA, allowSplit, allowMerge) */
  private val inventory: Seq[(String, Double, Double, Double, Double, Int,
      Option[Double], Double, Boolean, Boolean)] = Seq(
    ("SAM",                 10.0, 12.0,  5.0,  8.0, 3, None,      1.0, true,  true),
    ("cyto3",               10.0, 12.0,  4.0,  7.0, 3, None,      1.0, true,  true),
    ("iolight_a",            8.0, 11.0,  5.0,  6.0, 2, None,      0.5, true,  true),
    ("iolight_b",            9.0, 13.0,  6.0,  9.0, 4, None,      0.5, true,  true),
    ("iolight_c",           10.0, 14.0,  5.5,  8.5, 3, None,      2.0, true,  true),
    ("livecyte_bf",         11.0, 12.5,  4.5,  7.5, 3, Some(0.5), 1.0, true,  true),
    ("livecyte_phase",       9.5, 11.5,  5.0,  8.0, 2, Some(0.3), 1.0, true,  true),
    ("openflexure",         10.0, 12.0,  5.0,  8.0, 3, None,      1.0, false, true),
    ("tomocube_cyto3",      12.0, 15.0,  6.0, 10.0, 4, None,      1.5, true,  false),
    ("tomocube_livecyte",   10.5, 12.5,  5.5,  8.5, 3, None,      1.0, true,  true))

  private def templateJson(row: (String, Double, Double, Double, Double, Int,
      Option[Double], Double, Boolean, Boolean)): String = {
    val (_, link, gap, split, merge, maxGap, linkPen, mergePen, aSplit, aMerge) = row
    val linkPenJson = linkPen.map(w => s"""{"AREA": $w}""").getOrElse("{}")
    s"""{
      "run": {"tracking": true},
      "tracking": {
        "algorithm": "SparseLAP",
        "settings": {
          "LINKING_MAX_DISTANCE": $link,
          "LINKING_FEATURE_PENALTIES": $linkPenJson,
          "ALLOW_GAP_CLOSING": true,
          "GAP_CLOSING_MAX_DISTANCE": $gap,
          "GAP_CLOSING_FEATURE_PENALTIES": {},
          "MAX_FRAME_GAP": $maxGap,
          "ALLOW_TRACK_SPLITTING": $aSplit,
          "SPLITTING_MAX_DISTANCE": $split,
          "SPLITTING_FEATURE_PENALTIES": {},
          "ALLOW_TRACK_MERGING": $aMerge,
          "MERGING_MAX_DISTANCE": $merge,
          "MERGING_FEATURE_PENALTIES": {"AREA": $mergePen},
          "ALTERNATIVE_LINKING_COST_FACTOR": 1.05,
          "CUTOFF_PERCENTILE": 0.9
        }
      },
      "QC": {"minimum_observations": 50, "minimum_cell_size": 50}
    }"""
  }

  test("all ten template structures: tracks() equals the direct call chain") {
    for (row <- inventory) {
      val (name, link, gap, _, _, maxGap, linkPen, _, _, _) = row
      val got = TrackerConfig.tracks(spots, templateJson(row), vid)
        .as[(Long, Long)].collect().toSet
      val pens = linkPen.map(w => Seq((col("AREA"), w))).getOrElse(Nil)
      val edges = LapLink.frameToFrame(spots, col("id"), col("frame"),
        col("x"), col("y"), link, pens, altCostFactor = Some(1.05))
      val want = TrackAssignment.divisionAwareGapClosedByVideo(
          spots, edges.select("src", "dst"), gap, maxGap, vid,
          altCostFactor = Some(1.05), cutoffPercentile = 0.9)
        .as[(Long, Long)].collect().toSet
      assert(got === want && got.nonEmpty, s"template $name")
    }
  }

  test("all ten template structures: lineage() equals gapCloseFull with per-block gates and penalties") {
    for (row <- inventory) {
      val (name, link, gap, split, merge, maxGap, linkPen, mergePen, aSplit, aMerge) = row
      val got = TrackerConfig.lineage(spots, templateJson(row), vid)
        .select("src", "dst", "kind").as[(Long, Long, String)].collect().toSet
      val pens = linkPen.map(w => Seq((col("AREA"), w))).getOrElse(Nil)
      val edges = LapLink.frameToFrame(spots, col("id"), col("frame"),
        col("x"), col("y"), link, pens, altCostFactor = Some(1.05))
      val labels = TrackAssignment.divisionAwareByVideo(spots,
        edges.select("src", "dst"), vid)
      val want = LapLink.gapCloseFull(spots, labels, col("id"), col("frame"),
          col("x"), col("y"), gap, maxGap, vid,
          allowSplit = aSplit, allowMerge = aMerge,
          splitDist = Some(split), mergeDist = Some(merge),
          mergePenalties = Seq((col("AREA"), mergePen)),
          altCostFactor = Some(1.05), cutoffPercentile = 0.9)
        .select("src", "dst", "kind").as[(Long, Long, String)].collect().toSet
      assert(got === want, s"template $name")
    }
  }

  test("the conditioning keys from the template bite: ALTERNATIVE_LINKING_COST_FACTOR " +
      "x CUTOFF_PERCENTILE rejects an outlier-cost gap under its gate") {
    // one video, 20 gap candidates across a skipped frame: 19 at
    // d²≈1 and one OUTLIER at d²≈49 — all under the 10-pixel gap
    // gate (each track also drifts 0.1 px/frame in x so no
    // frame-to-frame distance is exactly 0 and the linking matrices
    // stay non-degenerate). The templates' 1.05/0.9 conditioning
    // (explicit OR via the TrackerKeys defaults an omitting template
    // inherits through getDefaultSettings-then-overlay) takes
    // the INTERPOLATED p90 of the 20 costs (TMUtils.getPercentile:
    // pos = 0.9·21 = 18.9 falls between the 18th and 19th smallest,
    // both ≈1) ≈ 1, so 2A ≈ 2.2 < 49 leaves the outlier's ends
    // unlinked — the Jaqaman outlier rejection.
    val outlier = 19
    val spots = (0 to outlier).flatMap { i =>
      val off = if (i == outlier) 7.0 else 1.0
      def xat(f: Long) = i * 100.0 + f * 0.1
      Seq((10L * i + 1, 0L, xat(0), 0.0), (10L * i + 2, 1L, xat(1), 0.0),
        (10L * i + 3, 3L, xat(3), off), (10L * i + 4, 4L, xat(4), off))
    }.toDF("id", "frame", "x", "y")
    def tpl(conditioning: String) = s"""{
      "tracking": {"algorithm": "SparseLAP", "settings": {
        "LINKING_MAX_DISTANCE": 3.0,
        "ALLOW_GAP_CLOSING": true, "GAP_CLOSING_MAX_DISTANCE": 10.0,
        "MAX_FRAME_GAP": 3,
        "ALLOW_TRACK_SPLITTING": false, "ALLOW_TRACK_MERGING": false
        $conditioning}}}"""
    val cond =
      ""","ALTERNATIVE_LINKING_COST_FACTOR": 1.05, "CUTOFF_PERCENTILE": 0.9"""
    def gcs(json: String): Set[(Long, Long)] =
      TrackerConfig.lineage(spots, json, vid)
        .filter(col("kind") === "gc")
        .select("src", "dst").as[(Long, Long)].collect().toSet
    val all = (0 to outlier).map(i => (10L * i + 2, 10L * i + 3)).toSet
    val outlierGc = (10L * outlier + 2, 10L * outlier + 3)
    // TrackMate's getDefaultSettings-then-overlay semantics: a template
    // OMITTING the keys runs under the 1.05/0.9 DEFAULTS, so the
    // outlier is rejected with and without the explicit keys; the
    // gate-bound no-conditioning baseline is only reachable through
    // the operator surface (a deliberately absurd factor restores it)
    assert(gcs(tpl("")) === all - outlierGc,
      "TrackerKeys defaults condition an omitting template")
    val conditioned = gcs(tpl(cond))
    assert(conditioned === all - outlierGc,
      s"the 1.05/0.9 conditioning must reject exactly the outlier; got $conditioned")
    val unconditioned = gcs(tpl(
      ""","ALTERNATIVE_LINKING_COST_FACTOR": 1000000.0"""))
    assert(unconditioned === all,
      "an explicit huge factor shows the contrast: all 20 gaps close")
    // the LABEL path applies the same segment conditioning: without
    // the keys every fragment pair merges into one track per i (20
    // tracks); with them the outlier's two fragments keep separate
    // labels (21 tracks)
    def nTracks(json: String): Long =
      TrackerConfig.tracks(spots, json, vid)
        .select("track_id").distinct().count()
    assert(nTracks(tpl(
      ""","ALTERNATIVE_LINKING_COST_FACTOR": 1000000.0""")) === outlier + 1L)
    assert(nTracks(tpl(cond)) === outlier + 2L,
      "tracks() must refuse the outlier gap too — the conditioning is " +
        "not a lineage-only surface")
    assert(nTracks(tpl("")) === outlier + 2L,
      "the label path conditions under the TrackerKeys defaults too")
  }

  test("linking phase under the template keys: factor at TrackMate's hardcoded " +
      "percentile 1.0 (factor·max) never refuses a gated link") {
    // SparseLAPFrameToFrameTracker passes percentile 1d to its cost
    // matrix creator, so A = 1.05·max(gated costs) and every gated
    // link has cost ≤ max < 2A: on the same 20-candidate layout with
    // NO skipped frame, the conditioned linking phase emits exactly
    // the unconditioned links — including the d²=49 'outlier', which
    // only the SEGMENT phase's p90 conditioning may reject.
    val outlier = 19
    val spots = (0 to outlier).flatMap { i =>
      val off = if (i == outlier) 7.0 else 1.0
      Seq((10L * i + 1, 0L, i * 100.0, 0.0), (10L * i + 2, 1L, i * 100.0, off))
    }.toDF("id", "frame", "x", "y")
    def links(factor: Option[Double]): Set[(Long, Long)] =
      LapLink.frameToFrame(spots, col("id"), col("frame"),
          col("x"), col("y"), maxDist = 10.0, altCostFactor = factor)
        .select("src", "dst").as[(Long, Long)].collect().toSet
    val all = (0 to outlier).map(i => (10L * i + 1, 10L * i + 2)).toSet
    assert(links(None) === all)
    assert(links(Some(1.05)) === all,
      "factor·max conditioning must keep every gated frame-to-frame link")
  }

  test("the merge penalty from the template bites: {AREA: 0.5} redirects a merge " +
      "to the look-alike, as on every reference template") {
    // dying track A (AREA 5) ends at frame 4 @(8,10); two continuing
    // tracks offer a frame-5 middle OUTSIDE linking reach (gate 3) but
    // inside the merge gate (4): B is NEARER (d=3.2, d²=10.24) but
    // BIGGER (AREA 6.5), C is FARTHER (d=3.5, d²=12.25) but the same
    // size. Geometry-only picks B; {AREA: 0.5} inflates B's cost to
    // 10.24·(1 + 1.5·1.5/11.5)² ≈ 14.64 > 12.25, so the penalized
    // solve picks C — both still under the 16 gate, a pure cost flip.
    val mergeSpots = (
      (0 to 4).map(f => (100L + f, f.toLong, f * 2.0, 10.0, 5.0)) ++
        (0 to 10).map(f => (200L + f, f.toLong, f * 2.0 - 2.0, 13.2, 6.5)) ++
        (0 to 10).map(f => (300L + f, f.toLong, f * 2.0 - 2.0, 6.5, 5.0))
      ).toDF("id", "frame", "x", "y", "AREA")
    def tpl(mergePenalties: String) = s"""{
      "tracking": {"algorithm": "SparseLAP", "settings": {
        "LINKING_MAX_DISTANCE": 3.0,
        "ALLOW_GAP_CLOSING": true, "GAP_CLOSING_MAX_DISTANCE": 3.0,
        "MAX_FRAME_GAP": 2,
        "ALLOW_TRACK_SPLITTING": false,
        "ALLOW_TRACK_MERGING": true, "MERGING_MAX_DISTANCE": 4.0,
        "MERGING_FEATURE_PENALTIES": $mergePenalties}}}"""
    def merges(df: org.apache.spark.sql.DataFrame, json: String): Set[(Long, Long)] =
      TrackerConfig.lineage(df, json, vid)
        .filter(col("kind") === "merge")
        .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(merges(mergeSpots, tpl("{}")) === Set((104L, 205L)),
      "geometry-only must pick the nearer big cell B")
    assert(merges(mergeSpots, tpl("""{"AREA": 0.5}""")) === Set((104L, 305L)),
      "the reference templates' AREA penalty must redirect the merge to C")
    // TrackMate gates on the PENALIZED cost: with only B on offer and
    // a heavy penalty (10.24·(1 + 3·1.5/11.5)² ≈ 19.8 > 16) the merge
    // candidate falls out of the block entirely
    val aAndB = mergeSpots.filter(col("id") < 300L)
    assert(merges(aAndB, tpl("{}")) === Set((104L, 205L)))
    assert(merges(aAndB, tpl("""{"AREA": 1.0}""")) === Set.empty,
      "a penalized cost past MERGING_MAX_DISTANCE² must drop the candidate")
  }

  test("the split gate from the template bites: a tiny SPLITTING_MAX_DISTANCE drops the fork edge") {
    // default-gate template finds lineage edges for the fork video;
    // shrinking only SPLITTING_MAX_DISTANCE to 0.1 removes exactly
    // the split-kind edges while gc edges survive
    val base = inventory.head
    val wide = TrackerConfig.lineage(spots, templateJson(base), vid)
      .select("kind").as[String].collect().toSet
    assert(wide.contains("split"),
      s"the fork video must produce a split edge at the template gates; got $wide")
    val tightRow = base.copy(_4 = 0.1)
    val tight = TrackerConfig.lineage(spots, templateJson(tightRow), vid)
      .select("kind").as[String].collect().toSet
    assert(!tight.contains("split"))
    assert(wide.contains("gc") == tight.contains("gc"),
      "gap-close edges are untouched by the split gate")
  }
}
