package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s.{JBool, JDecimal, JDouble, JInt, JLong, JObject, JValue}
import org.json4s.jackson.JsonMethods

/** Config-template tracker dispatch — the reference's actual API
  * surface: track_images.py:95-124 (`load_tracker`) selects one of six
  * TrackMate factories from `config["algorithm"]` and applies
  * `config["settings"]` (TrackMate TrackerKeys names), with per-
  * microscope templates shipped as JSON (the templates dir, e.g.
  * cyto3.json's SparseLAP block). A reference user's template runs
  * against graft unchanged: the same algorithm names dispatch to the
  * corresponding graft tracker, and the same settings keys map onto
  * its parameters. Unknown algorithms throw listing the menu,
  * mirroring the reference's KeyError.
  *
  * Key mapping (TrackerKeys.java is the public reference):
  *  - LINKING_MAX_DISTANCE      -> frame-to-frame gate (all trackers)
  *  - LINKING_FEATURE_PENALTIES -> LapLink featurePenalties; each
  *       penalty key must name a column of `spots` (TrackMate feature
  *       keys become your feature columns)
  *  - ALLOW_GAP_CLOSING, GAP_CLOSING_MAX_DISTANCE, MAX_FRAME_GAP
  *       -> the segment-level second LAP phase
  *  - ALLOW_TRACK_SPLITTING / ALLOW_TRACK_MERGING -> [[lineage]]'s
  *       full-Jaqaman blocks (TrackMate models splits/merges as graph
  *       edges, not label merges — hence the separate surface)
  *  - SPLITTING_MAX_DISTANCE / MERGING_MAX_DISTANCE -> the split and
  *       merge blocks' own distance gates (the reference templates set
  *       all three gates differently — e.g. gap 90 / merge 50 /
  *       split 5)
  *
  * ABSENT keys take TrackMate's TrackerKeys DEFAULTS (r14): the
  * reference's `load_tracker` starts from the factory's
  * `getDefaultSettings()` and OVERLAYS the template's settings
  * (track_images.py:108-124), so a config omitting a key runs under
  * the default, not a graft-invented fallback — gap/split/merge gates
  * 15.0, MAX_FRAME_GAP 2, and the Jaqaman conditioning always on at
  * 1.05 / 0.9 unless overridden. All ten shipped templates set every
  * key explicitly, so no reference config is affected.
  *  - GAP_CLOSING/SPLITTING/MERGING_FEATURE_PENALTIES -> the second
  *       phase's per-block penalty maps ([[lineage]] ->
  *       [[LapLink.gapCloseFull]]): cost = d²·(1 + Σ 3·w·|Δf|/Σf)²
  *       per block, gated on the penalized cost as in TrackMate's
  *       segment cost matrix. This is the reference's UNIVERSAL
  *       default — all ten shipped templates enable merging with
  *       MERGING_FEATURE_PENALTIES: {"AREA": 0.5}
  *       (templates/cyto3.json), so merge-block costs must see the
  *       AREA difference
  *  - KALMAN_SEARCH_RADIUS      -> the Kalman prediction gate
  *  - MIN_IOU                   -> the Overlap tracker's IoU floor
  *  - GRID_CELL_SIZE            -> graft extension: the Overlap
  *       tracker's candidate grid pitch (no TrackMate analogue; its
  *       kd-tree equivalent is internal)
  *
  *  - ALTERNATIVE_LINKING_COST_FACTOR / CUTOFF_PERCENTILE -> the
  *       Jaqaman alternative-cost conditioning, applied on EVERY
  *       dispatch surface (every template sets 1.05 / 0.9), each as
  *       TrackMate wires it:
  *       · LINKING phase ([[tracks]] and [[lineage]]'s frame edges):
  *         A = factor · max(the frame pair's gated costs) —
  *         SparseLAPFrameToFrameTracker hardcodes percentile 1d when
  *         it builds JaqamanLinkingCostMatrixCreator
  *         (computeAlternativeCosts' percentile == 1 branch is
  *         factor·max; KalmanTracker names the same 1.05/1d pair as
  *         constants), so CUTOFF_PERCENTILE does NOT bind this phase
  *       · SEGMENT phase: A = factor · CUTOFF_PERCENTILE(gated
  *         candidate costs), interpolated as TMUtils.getPercentile —
  *         both in [[lineage]]'s full split/merge matrix and in
  *         [[tracks]]' gap-close relabeling, which rejects
  *         outlier-cost gap closings even under their gate
  *
  * The label path's gap-close relabeling applies
  * GAP_CLOSING_FEATURE_PENALTIES too (r15 — the same penalized cost
  * and penalized gate as [[lineage]]'s gap block, so the two surfaces
  * agree on every close; all ten reference templates set the map to
  * {}, where both reduce bit-identically to the geometric cost). One
  * declared narrowing remains: the relabel pass's conditioning
  * percentile ranges over the gap-close candidates only (its matrix
  * has no split/merge blocks — by construction, since the reference's
  * label semantics consume only gap-close links,
  * parse_xml.py:147-158).
  *
  * `config` may be a whole template (the `tracking` object is used) or
  * the tracking object itself. `spots` is (id, frame, x, y) —
  * plus (x0, x1, y0, y1) boxes for Overlap, plus any penalty feature
  * columns. Output: (id, track_id) for every spot.
  */
object TrackerConfig {

  val Algorithms: Seq[String] = Seq("SimpleSparseLAP", "SparseLAP",
    "Kalman", "AdvancedKalman", "NearestNeighbor", "Overlap")

  private case class Cfg(algorithm: String, settings: Map[String, JValue]) {
    private def num(k: String): Option[Double] = settings.get(k).collect {
      case JDouble(v)  => v
      case JInt(v)     => v.toDouble
      case JLong(v)    => v.toDouble
      case JDecimal(v) => v.toDouble
    }
    def d(k: String, dflt: Double): Double = num(k).getOrElse(dflt)
    def opt(k: String): Option[Double] = num(k)
    def i(k: String, dflt: Int): Int = num(k).map(_.toInt).getOrElse(dflt)
    def b(k: String, dflt: Boolean): Boolean = settings.get(k).collect {
      case JBool(v) => v
    }.getOrElse(dflt)
    def penalties(k: String): Seq[(String, Double)] = settings.get(k).collect {
      case JObject(fields) => fields.collect {
        case (name, JDouble(w))  => name -> w
        case (name, JInt(w))     => name -> w.toDouble
        case (name, JDecimal(w)) => name -> w.toDouble
      }
    }.getOrElse(Nil)
  }

  private def parse(configJson: String): Cfg = {
    val root = JsonMethods.parse(configJson)
    val tracking = root \ "tracking" match {
      case o: JObject => o
      case _          => root
    }
    val algorithm = tracking \ "algorithm" match {
      case org.json4s.JString(a) => a
      case _ => throw new IllegalArgumentException(
        "config has no tracking.algorithm")
    }
    val settings = tracking \ "settings" match {
      case JObject(fields) => fields.toMap
      case _               => Map.empty[String, JValue]
    }
    Cfg(algorithm, settings)
  }

  /** Frame-to-frame LAP edges under the template's linking keys — the
    * first Jaqaman phase, shared by [[tracks]] and [[lineage]] so the
    * key mapping cannot diverge between the two surfaces.
    * SimpleSparseLAP exposes no penalties, as in TrackMate. */
  private def jaqamanFrameEdges(spots: DataFrame, cfg: Cfg,
                                linkDist: Double): DataFrame = {
    val pens =
      if (cfg.algorithm == "SparseLAP")
        cfg.penalties("LINKING_FEATURE_PENALTIES")
          .map { case (name, w) => (col(name), w) }
      else Nil
    // cutoffPercentile stays frameToFrame's default 1.0 (factor·max):
    // TrackMate's SparseLAPFrameToFrameTracker passes 1d, NOT
    // CUTOFF_PERCENTILE, which conditions the segment matrix only
    LapLink.frameToFrame(spots, col("id"), col("frame"),
      col("x"), col("y"), linkDist, pens,
      altCostFactor =
        Some(cfg.d("ALTERNATIVE_LINKING_COST_FACTOR", 1.05)))
  }

  /** Track labels (id, track_id) under the template's tracker. */
  def tracks(spots: DataFrame, configJson: String,
             videoOf: Long => Long): DataFrame = {
    val cfg = parse(configJson)
    val linkDist = cfg.d("LINKING_MAX_DISTANCE", 15.0)
    cfg.algorithm match {
      case "NearestNeighbor" =>
        TrackAssignment.nearestTracksByVideo(spots, linkDist,
          gapFrames = 1, videoOf)
      case "Overlap" =>
        val edges = SpotLink.overlap(spots, col("id"), col("frame"),
          col("x0"), col("x1"), col("y0"), col("y1"),
          minIou = cfg.d("MIN_IOU", 0.3),
          cellSize = cfg.d("GRID_CELL_SIZE", 50.0))
        TrackAssignment.divisionAwareByVideo(spots, edges.select("src", "dst"),
          videoOf)
      case "Kalman" =>
        KalmanLink.tracks(spots, col("id"), col("frame"), col("x"), col("y"),
          maxDist = cfg.d("KALMAN_SEARCH_RADIUS", linkDist),
          gapFrames = cfg.i("MAX_FRAME_GAP", 2), videoOf)
      case "AdvancedKalman" =>
        KalmanAdaptive.tracks(spots, col("id"), col("frame"), col("x"), col("y"),
          maxDist = cfg.d("KALMAN_SEARCH_RADIUS", linkDist),
          gapFrames = cfg.i("MAX_FRAME_GAP", 2), videoOf)
      case "SimpleSparseLAP" | "SparseLAP" =>
        val edges = jaqamanFrameEdges(spots, cfg, linkDist)
        // ABSENT keys take TrackMate's TrackerKeys DEFAULTS, because
        // that is what a template actually means: load_tracker starts
        // from factory.getDefaultSettings() and OVERLAYS the
        // template's settings (track_images.py:108-124), so a config
        // omitting GAP_CLOSING_MAX_DISTANCE runs at 15.0 (not the
        // linking gate) and the Jaqaman conditioning is ALWAYS on at
        // 1.05/0.9 unless a key overrides it. All ten shipped
        // templates set every key explicitly, so no reference config
        // moves.
        if (cfg.b("ALLOW_GAP_CLOSING", dflt = true))
          TrackAssignment.divisionAwareGapClosedByVideo(spots,
            edges.select("src", "dst"),
            maxDist = cfg.d("GAP_CLOSING_MAX_DISTANCE", 15.0),
            maxGap = cfg.i("MAX_FRAME_GAP", 2), videoOf,
            altCostFactor =
              Some(cfg.d("ALTERNATIVE_LINKING_COST_FACTOR", 1.05)),
            cutoffPercentile = cfg.d("CUTOFF_PERCENTILE", 0.9),
            // the penalty map is SparseLAP surface, like the linking
            // one (TrackMate's Simple factory hides it); it prices —
            // and gates — the relabel pass's gap closes exactly as it
            // does lineage's gap block, so the two surfaces agree
            gapPenalties =
              if (cfg.algorithm == "SparseLAP")
                cfg.penalties("GAP_CLOSING_FEATURE_PENALTIES")
                  .map { case (name, w) => (col(name), w) }
              else Nil)
        else
          TrackAssignment.divisionAwareByVideo(spots,
            edges.select("src", "dst"), videoOf)
      case other =>
        throw new IllegalArgumentException(
          s"tracker must be one of ${Algorithms.mkString(",")}; got $other")
    }
  }

  /** The template's QC block (`QC.minimum_observations`,
    * `QC.minimum_cell_size` — main.nf:165-190's filter params),
    * dispatched onto [[Quality.filterSizeAndObservations]]: rows with
    * `measure` under the size floor drop, then tracks left with too
    * few observations drop whole. Defaults mirror the reference
    * templates (50/50). */
  def qcFilter(df: DataFrame, configJson: String, entity: String,
               measure: org.apache.spark.sql.Column): DataFrame = {
    val root = JsonMethods.parse(configJson)
    def num(v: JValue): Option[Double] = v match {
      case JDouble(x)  => Some(x)
      case JInt(x)     => Some(x.toDouble)
      case JLong(x)    => Some(x.toDouble)
      case JDecimal(x) => Some(x.toDouble)
      case _           => None
    }
    val minSize = num(root \ "QC" \ "minimum_cell_size").getOrElse(50.0)
    val minObs = num(root \ "QC" \ "minimum_observations").getOrElse(50.0).toLong
    Quality.filterSizeAndObservations(df, entity, measure, minSize, minObs)
  }

  /** The SparseLAP lineage-edge surface (src, dst, gap, dist, kind,
    * src_track, dst_track): gap-close links plus split/merge edges
    * when the template enables them — TrackMate's graph-edge
    * semantics. Only meaningful for the Jaqaman trackers. */
  def lineage(spots: DataFrame, configJson: String,
              videoOf: Long => Long): DataFrame = {
    val cfg = parse(configJson)
    require(cfg.algorithm == "SparseLAP" || cfg.algorithm == "SimpleSparseLAP",
      s"lineage is a Jaqaman-tracker surface; got ${cfg.algorithm}")
    // the second-phase matrix solves gap/split/merge JOINTLY; a
    // template disabling gap closing while keeping split/merge blocks
    // is not expressible here — throw rather than silently include
    // gap-close edges tracks() would not have made
    require(cfg.b("ALLOW_GAP_CLOSING", dflt = true),
      "lineage requires ALLOW_GAP_CLOSING (the split/merge blocks solve " +
        "jointly with gap closing in this engine)")
    val linkDist = cfg.d("LINKING_MAX_DISTANCE", 15.0)
    val edges = jaqamanFrameEdges(spots, cfg, linkDist)
    val labels = TrackAssignment.divisionAwareByVideo(spots,
      edges.select("src", "dst"), videoOf)
    // per-block penalty maps are SparseLAP surface only, like the
    // linking-phase map (TrackMate's Simple factory hides them)
    def pens(k: String): Seq[(org.apache.spark.sql.Column, Double)] =
      if (cfg.algorithm == "SparseLAP")
        cfg.penalties(k).map { case (name, w) => (col(name), w) }
      else Nil
    // absent keys take TrackMate's TrackerKeys defaults — the
    // getDefaultSettings-then-overlay semantics of load_tracker
    // (see tracks()); the 15.0 gates and the 1.05/0.9 conditioning
    // are what an omitting config actually runs under in TrackMate
    LapLink.gapCloseFull(spots, labels, col("id"), col("frame"),
      col("x"), col("y"),
      maxDist = cfg.d("GAP_CLOSING_MAX_DISTANCE", 15.0),
      maxGap = cfg.i("MAX_FRAME_GAP", 2), videoOf,
      allowSplit = cfg.b("ALLOW_TRACK_SPLITTING", dflt = false),
      allowMerge = cfg.b("ALLOW_TRACK_MERGING", dflt = false),
      splitDist = Some(cfg.d("SPLITTING_MAX_DISTANCE", 15.0)),
      mergeDist = Some(cfg.d("MERGING_MAX_DISTANCE", 15.0)),
      gapPenalties = pens("GAP_CLOSING_FEATURE_PENALTIES"),
      splitPenalties = pens("SPLITTING_FEATURE_PENALTIES"),
      mergePenalties = pens("MERGING_FEATURE_PENALTIES"),
      altCostFactor =
        Some(cfg.d("ALTERNATIVE_LINKING_COST_FACTOR", 1.05)),
      cutoffPercentile = cfg.d("CUTOFF_PERCENTILE", 0.9))
  }
}
