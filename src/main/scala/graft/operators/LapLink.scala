package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-frame-pair assignment linking — the SimpleSparseLAP end
  * of the reference's tracker menu (track_images.py:95-100, TrackMate's
  * default): between consecutive frames, choose the GLOBALLY optimal
  * set of links, not each spot's greedy favourite. Semantics: a link
  * (p, c) within `maxDist` has weight `2L - d2` (L = maxDist², the
  * standard alternative-cost formulation: leaving a spot unlinked
  * costs L per side); the chosen matching maximises total weight —
  * equivalently, minimises Σ d2 + L·(#unlinked) — solved exactly with
  * the O(n³) Hungarian algorithm on the dummy-padded square matrix.
  * TrackMate's gap-closing/split/merge refinements are a separate
  * global pass there and are served here by the division-aware
  * machinery (`SpotLink` + `TrackAssignment`); this operator is the
  * frame-to-frame assignment step.
  *
  * Scale shape: ONE shuffle groups each frame pair's spots together
  * (every spot participates in two pairs: as child of f-1→f and parent
  * of f→f+1 — a 2x map-side duplication, not a join); pairs solve
  * independently, so at 100 TB parallelism comes from (video, frame)
  * granularity — millions of pairs — while each solve is bounded by
  * spots-per-frame (an imaging field holds hundreds of cells; n³ on
  * hundreds is sub-millisecond).
  *
  * Output: (src, dst, dist) — a 1-1 matching per frame pair.
  *
  * `featurePenalties` is the TrackMate LINKING_FEATURE_PENALTIES
  * surface (TrackerKeys): each (feature column, weight) inflates a
  * gated link's cost by the features' relative difference —
  * cost = d² · (1 + Σ 3·w·|f_p − f_c| / (f_p + f_c))², penalty 0 when
  * both values are 0 — so geometry proposes and features veto: a
  * nearer spot with a very different size/intensity loses to a
  * slightly farther look-alike. As in TrackMate's linking matrix, the
  * `maxDist` gate applies to the PENALIZED cost (the cost function's
  * value is checked against costThreshold = maxDist²), so a nearby
  * pair with a wildly different feature value is not a candidate at
  * all; with no penalties this reduces to the geometric gate. The
  * emitted `dist` stays the geometric distance.
  *
  * `altCostFactor` / `cutoffPercentile` are the
  * ALTERNATIVE_LINKING_COST_FACTOR / CUTOFF_PERCENTILE surface for
  * THIS phase: with the factor set, the no-link alternative of each
  * frame-pair matrix is A = factor · percentile(that pair's gated
  * costs) instead of the gate bound maxDist². The percentile DEFAULTS
  * to 1.0 — factor·max — because that is what TrackMate's
  * SparseLAPFrameToFrameTracker does: it hardcodes percentile 1d when
  * building JaqamanLinkingCostMatrixCreator (whose
  * computeAlternativeCosts short-circuits percentile == 1 to
  * factor·max; KalmanTracker uses the same 1.05/1.0 pair as named
  * constants), and CUTOFF_PERCENTILE binds only the SEGMENT matrix
  * (phase 2). With factor·max every gated link survives the
  * alternative (cost ≤ max < 2A), so under the reference templates
  * the linking phase differs from the gate-bound default only through
  * the penalized-cost gate; a caller passing an explicit sub-1
  * percentile gets genuine Jaqaman outlier rejection per frame pair.
  */
object LapLink {

  /** TrackMate's percentile (TMUtils.getPercentile): rank position
    * p·(n+1) over the sorted values, LINEARLY INTERPOLATED between the
    * two neighbouring order statistics, clamped to [min, max]; a
    * single value is returned as-is. p ∈ (0, 1]. The conditioning
    * callers below feed this TrackMate's CUTOFF_PERCENTILE, so the
    * definition must be the interpolated one, not nearest-rank —
    * near rank boundaries the two disagree and with them which
    * outlier links the alternative cost rejects. p = 1 gives the max
    * (pos = n+1 clamps), which is exactly
    * JaqamanLinkingCostMatrixCreator.computeAlternativeCosts'
    * percentile == 1 → factor·max short-circuit. */
  private[graft] def percentileTM(xs: Array[Double], p: Double): Double = {
    require(xs.nonEmpty && p > 0.0 && p <= 1.0)
    if (xs.length == 1) return xs(0)
    val s = xs.sorted
    val n = s.length
    val pos = p * (n + 1)
    if (pos < 1.0) s(0)
    else if (pos >= n) s(n - 1)
    else {
      val ip = pos.toInt
      s(ip - 1) + (pos - ip) * (s(ip) - s(ip - 1))
    }
  }

  /** Penalized cost of a gated pair (shared by [[frameToFrame]] and
    * its spec): d² · (1 + Σ 3·w·|fp − fc| / (fp + fc))². */
  private[operators] def penalizedCost(d2: Double, fp: Array[Double],
                                       fc: Array[Double],
                                       w: Array[Double]): Double = {
    var p = 0.0
    var i = 0
    while (i < w.length) {
      val s = fp(i) + fc(i)
      if (s != 0.0) p += 3.0 * w(i) * math.abs(fp(i) - fc(i)) / s
      i += 1
    }
    d2 * (1.0 + p) * (1.0 + p)
  }

  def frameToFrame(spots: DataFrame, id: Column, frame: Column,
                   x: Column, y: Column, maxDist: Double,
                   featurePenalties: Seq[(Column, Double)] = Nil,
                   altCostFactor: Option[Double] = None,
                   cutoffPercentile: Double = 1.0): DataFrame = {
    require(maxDist > 0.0, "maxDist must be positive")
    require(altCostFactor.forall(_ > 0.0), "altCostFactor must be positive")
    require(cutoffPercentile > 0.0 && cutoffPercentile <= 1.0,
      "cutoffPercentile in (0, 1]")
    val spark = spots.sparkSession
    import spark.implicits._
    val weights = featurePenalties.map(_._2).toArray
    val featArr =
      if (featurePenalties.isEmpty) typedLit(Array.empty[Double])
      else array(featurePenalties.map(_._1.cast("double")): _*)
    val s = spots.select(id.cast("long").as("id"), frame.cast("long").as("frame"),
      x.cast("double").as("x"), y.cast("double").as("y"), featArr.as("fs"))
    val asParent = s.select(col("frame").as("pair"), lit(0).as("role"),
      col("id"), col("x"), col("y"), col("fs"))
    val asChild = s.select((col("frame") - 1).as("pair"), lit(1).as("role"),
      col("id"), col("x"), col("y"), col("fs"))
    val maxD2 = maxDist * maxDist
    // explicit-width repartition, NOT groupByKey: the shuffle is tiny
    // in bytes but each group is a CPU-dense assignment solve, and
    // AQE's coalescing (which optimizes for data size) would pack all
    // groups onto a couple of threads. An explicit partition count is
    // exempt from AQE coalescing, pinning the parallelism; pairs are
    // then grouped locally within their partition.
    val width = spark.sparkContext.defaultParallelism
    asParent.union(asChild)
      .repartition(width, col("pair"))
      .sortWithinPartitions(col("pair"))
      .as[(Long, Int, Long, Double, Double, Seq[Double])]
      .mapPartitions { it =>
        // rows arrive sorted by pair (Spark's sort spills, unlike a
        // per-partition HashMap of every group), so consecutive-key
        // grouping bounds task memory to ONE frame pair's spots
        val buf = it.buffered
        new Iterator[Iterator[(Long, Long, Double)]] {
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[(Long, Long, Double)] = {
            val pair = buf.head._1
            val rows = scala.collection.mutable.ArrayBuffer
              .empty[(Int, Long, Double, Double, Array[Double])]
            while (buf.hasNext && buf.head._1 == pair) {
              val r = buf.next()
              rows.append((r._2, r._3, r._4, r._5, r._6.toArray))
            }
            val ps = rows.filter(_._1 == 0).map(r => (r._2, r._3, r._4, r._5))
              .sortBy(_._1).toArray
            val cs = rows.filter(_._1 == 1).map(r => (r._2, r._3, r._4, r._5))
              .sortBy(_._1).toArray
            if (ps.isEmpty || cs.isEmpty) Iterator.empty
            else {
              // gate on geometry, cost with feature penalties
              val edges = Array.newBuilder[(Int, Int, Double)]
              val d2s = new java.util.HashMap[Long, Double]()
              var pi = 0
              while (pi < ps.length) {
                var ci = 0
                while (ci < cs.length) {
                  val dx = ps(pi)._2 - cs(ci)._2
                  val dy = ps(pi)._3 - cs(ci)._3
                  val d2 = dx * dx + dy * dy
                  if (d2 <= maxD2) {
                    val cost =
                      if (weights.isEmpty) d2
                      else penalizedCost(d2, ps(pi)._4, cs(ci)._4, weights)
                    // TrackMate's linking matrix gates on the COST:
                    // FeaturePenaltyCostFunction's value is checked
                    // against costThreshold = maxDist² (== d² with no
                    // penalties, where this reduces to the geometric
                    // gate above)
                    if (cost <= maxD2) {
                      edges += ((pi, ci, cost))
                      d2s.put(pi.toLong << 32 | ci.toLong, d2)
                    }
                  }
                  ci += 1
                }
                pi += 1
              }
              val es = edges.result()
              // the matrix-wide no-link alternative: factor ×
              // percentile of this pair's gated costs (TrackMate's
              // JaqamanLinkingCostMatrixCreator conditioning), or the
              // gate bound when no factor is set — the engine's
              // historical default, bit-identical to pre-conditioning
              // behavior. NOTE the percentile DEFAULTS to 1.0 (factor
              // · max): that is what SparseLAPFrameToFrameTracker
              // hardcodes (it passes 1d, not CUTOFF_PERCENTILE, which
              // binds the SEGMENT matrix only) — see TrackerConfig.
              val alt = altCostFactor match {
                case Some(f) if es.nonEmpty =>
                  f * percentileTM(es.map(_._3), cutoffPercentile)
                case _ => maxD2
              }
              assignEdges(ps.length, cs.length, es, alt)
                .iterator.map { case (pi2, ci2, _) =>
                  // getOrDefault(NaN) + require: a missing key must
                  // fail loudly, not unbox null to distance 0.0
                  val d2 = d2s.getOrDefault(pi2.toLong << 32 | ci2.toLong,
                    Double.NaN)
                  require(!d2.isNaN,
                    s"assigned edge $pi2->$ci2 has no gated distance")
                  (ps(pi2)._1, cs(ci2)._1,
                    graft.functions.Numeric.croundD(math.sqrt(d2), 4))
                }
            }
          }
        }.flatten
      }.toDF("src", "dst", "dist")
  }

  /** Gated max-weight matching over an EXPLICIT edge list — the
    * "sparse" in SparseLAP: the gated bipartite graph decomposes into
    * connected components (no gated edge crosses them and dummy
    * alternatives are free, so the global optimum is exactly the union
    * of per-component optima), and each component gets its own
    * Hungarian solve on its dummy-padded square matrix — O(Σ mᵢ³)
    * instead of O(m³). Cost semantics: a gated edge of cost d2 has
    * weight 2L - d2 (L = the alternative cost of leaving a node
    * unlinked, per side); the returned matching maximises total weight
    * — equivalently minimises Σ d2 + L·(#unlinked). Gate predicates
    * (distance for frame-to-frame, frame-window + distance for gap
    * closing) live with the caller. Returns (parentIdx, childIdx, d2)
    * in the CALLER's index space. */
  private[operators] def assignEdges(np: Int, nc: Int,
                                     edges: Array[(Int, Int, Double)],
                                     l: Double): Seq[(Int, Int, Double)] = {
    if (edges.isEmpty) return Seq.empty
    // union-find over parent nodes [0, np) and child nodes [np, np+nc)
    val parent = Array.tabulate(np + nc)(identity)
    def find(a: Int): Int = {
      var x = a
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    edges.foreach { case (p, c, _) =>
      val (rp, rc) = (find(p), find(np + c))
      if (rp != rc) parent(rp) = rc
    }
    edges.groupBy { case (p, _, _) => find(p) }.iterator.flatMap { case (_, es) =>
      val cps = es.map(_._1).distinct.sorted
      val ccs = es.map(_._2).distinct.sorted
      val pIdx = cps.zipWithIndex.toMap
      val cIdx = ccs.zipWithIndex.toMap
      val npl = cps.length
      val ncl = ccs.length
      val m = npl + ncl
      // an ungated cell must never appear in an optimum: the all-dummy
      // matching costs 0 and real links are >= -2L each, so any
      // matching through one ungated cell costs >= big - 2L·m;
      // big = 2L(m+1) makes that strictly positive — dominated by the
      // 0-cost reroute. Dummy pairings cost 0.
      val big = 2.0 * l * (m + 1)
      val cost = Array.ofDim[Double](m, m)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < m) {
          cost(i)(j) = if (i < npl && j < ncl) big else 0.0
          j += 1
        }
        i += 1
      }
      val d2Of = new java.util.HashMap[Long, Double]()
      es.foreach { case (p, c, d2) =>
        cost(pIdx(p))(cIdx(c)) = d2 - 2.0 * l
        d2Of.put(pIdx(p).toLong << 32 | cIdx(c).toLong, d2)
      }
      val rowToCol = hungarian(cost)
      (0 until npl).flatMap { i =>
        val j = rowToCol(i)
        if (j < ncl && d2Of.containsKey(i.toLong << 32 | j.toLong))
          Some((cps(i), ccs(j), d2Of.get(i.toLong << 32 | j.toLong)))
        else None
      }
    }.toSeq
  }

  /** One track segment's endpoints for the gap-closing pass; `sfs`/
    * `efs` carry the start/end spot's penalty feature values (empty
    * when the caller declares none). */
  private[operators] case class Seg(track: Long,
                                    sid: Long, sframe: Long, sx: Double, sy: Double,
                                    eid: Long, eframe: Long, ex: Double, ey: Double,
                                    sfs: Seq[Double], efs: Seq[Double])

  /** Segment-level gap closing — the SECOND phase of the reference's
    * default trackers (track_images.py:95-97, the jaqaman SparseLAP
    * factories): after frame-to-frame linking fragments tracks at
    * occlusions longer than the linker's gap window, a GLOBAL
    * assignment between track-segment ENDS and track-segment STARTS
    * (within `maxGap` frames and `maxDist` distance) decides which
    * fragments are the same cell. Solved with the same gated Hungarian
    * machinery as [[frameToFrame]] ([[assignEdges]]: weight 2L - d²,
    * L = maxDist², exact per component).
    *
    * Scale shape: ONE aggregate collapses spots to per-track endpoints
    * (corpus-sized shuffle, the unavoidable read), then ONE cogroup by
    * video — tracking never crosses videos, so at 100 TB the solves
    * parallelise across millions of videos while each solve is bounded
    * by segments-per-timelapse (thousands), with the in-solve
    * component decomposition cutting the Hungarian further. No
    * all-pairs join, no driver-side state.
    *
    * A segment's own start is never a candidate (its start precedes
    * its end), and matched links always point forward in time, so the
    * matching composes segments into CHAINS. Output: one row per
    * closed gap — (src = end spot of the earlier segment, dst = start
    * spot of the later one, gap, dist, src_track, dst_track). */
  def gapClose(spots: DataFrame, labels: DataFrame,
               id: Column, frame: Column, x: Column, y: Column,
               maxDist: Double, maxGap: Int,
               videoOf: Long => Long,
               altCostFactor: Option[Double] = None,
               cutoffPercentile: Double = 0.9,
               gapPenalties: Seq[(Column, Double)] = Nil): DataFrame = {
    require(maxDist > 0.0, "maxDist must be positive")
    require(maxGap >= 1, "maxGap must be >= 1")
    require(altCostFactor.forall(_ > 0.0), "altCostFactor must be positive")
    require(cutoffPercentile > 0.0 && cutoffPercentile <= 1.0,
      "cutoffPercentile in (0, 1]")
    val spark = spots.sparkSession
    import spark.implicits._
    // GAP_CLOSING_FEATURE_PENALTIES, exactly as in [[gapCloseFull]]'s
    // gap block: cost = d² · (1 + Σ 3·w·|Δf|/Σf)², the gate applied to
    // the PENALIZED cost (TrackMate's segment matrix thresholds the
    // cost); with an empty map this is bit-identical to the geometric
    // path. The endpoint spot's feature values ride the same
    // endpoint structs the coordinates do.
    val w = gapPenalties.map(_._2).toArray
    val hasPens = gapPenalties.nonEmpty // Columns must not reach closures
    val featArr =
      if (gapPenalties.isEmpty) typedLit(Array.empty[Double])
      else array(gapPenalties.map(_._1.cast("double")): _*)
    val s = spots.select(id.cast("long").as("id"), frame.cast("long").as("frame"),
      x.cast("double").as("x"), y.cast("double").as("y"), featArr.as("fs"))
    val lb = labels.select(col("id").cast("long").as("id"),
      col("track_id").cast("long").as("track"))
    val seg = s.join(lb, Seq("id"))
      .groupBy(col("track"))
      .agg(
        min_by(struct(col("id"), col("frame"), col("x"), col("y"), col("fs")),
          struct(col("frame"), col("id"))).as("s0"),
        max_by(struct(col("id"), col("frame"), col("x"), col("y"), col("fs")),
          struct(col("frame"), negate(col("id")))).as("s1"))
      .select(col("track"),
        col("s0.id").as("sid"), col("s0.frame").as("sframe"),
        col("s0.x").as("sx"), col("s0.y").as("sy"),
        col("s1.id").as("eid"), col("s1.frame").as("eframe"),
        col("s1.x").as("ex"), col("s1.y").as("ey"),
        col("s0.fs").as("sfs"), col("s1.fs").as("efs"))
      .as[Seg]
    val maxD2 = maxDist * maxDist
    seg.groupByKey(r => videoOf(r.track))
      .flatMapGroups { (_, it) =>
        val segs = it.toArray
        val eFs = segs.map(_.efs.toArray)
        val sFs = segs.map(_.sfs.toArray)
        val edges = Array.newBuilder[(Int, Int, Double)]
        val d2s = new java.util.HashMap[Long, Double]()
        var pi = 0
        while (pi < segs.length) {
          var ci = 0
          while (ci < segs.length) {
            val df = segs(ci).sframe - segs(pi).eframe
            if (df >= 1 && df <= maxGap) {
              val dx = segs(ci).sx - segs(pi).ex
              val dy = segs(ci).sy - segs(pi).ey
              val d2 = dx * dx + dy * dy
              if (d2 <= maxD2) {
                val cost =
                  if (!hasPens) d2
                  else penalizedCost(d2, eFs(pi), sFs(ci), w)
                if (cost <= maxD2) {
                  edges += ((pi, ci, cost))
                  d2s.put(pi.toLong << 32 | ci.toLong, d2)
                }
              }
            }
            ci += 1
          }
          pi += 1
        }
        val es = edges.result()
        // the segment matrix's no-link alternative: the Jaqaman
        // conditioning (factor × CUTOFF_PERCENTILE of the video's
        // gated candidate costs, interpolated percentile as in
        // TrackMate's segment matrix) when the factor is set, the
        // gate bound otherwise — same rule as [[gapCloseFull]]
        val alt = altCostFactor match {
          case Some(f) if es.nonEmpty =>
            f * percentileTM(es.map(_._3), cutoffPercentile)
          case _ => maxD2
        }
        assignEdges(segs.length, segs.length, es, alt)
          .iterator.map { case (pi2, ci2, _) =>
            val d2 = d2s.getOrDefault(pi2.toLong << 32 | ci2.toLong,
              Double.NaN)
            require(!d2.isNaN,
              s"assigned edge $pi2->$ci2 has no gated distance")
            (segs(pi2).eid, segs(ci2).sid, segs(ci2).sframe - segs(pi2).eframe,
              graft.functions.Numeric.croundD(math.sqrt(d2), 4),
              segs(pi2).track, segs(ci2).track)
          }
      }
      .toDF("src", "dst", "gap", "dist", "src_track", "dst_track")
  }

  /** One labeled spot row for the full (split/merge-aware) second
    * phase. `fs` carries the union of all blocks' penalty feature
    * values (empty when no block declares penalties). */
  private[operators] case class TSpot(track: Long, id: Long, frame: Long,
                                      x: Double, y: Double, fs: Seq[Double])

  /** The FULL Jaqaman second phase — gap closing PLUS track splitting
    * and merging in ONE global assignment (track_images.py:95-100
    * passes TrackMate tracker settings through, so
    * ALLOW_TRACK_SPLITTING / ALLOW_TRACK_MERGING are reference
    * surface): sources are segment ENDS and (when splitting) segment
    * MIDDLES; targets are segment STARTS and (when merging) MIDDLES.
    * Blocks: end→start within `maxGap` frames (gap closing, gated by
    * `maxDist`), end→middle at frame gap 1 (merging, gated by
    * `mergeDist` — TrackMate's MERGING_MAX_DISTANCE — defaulting to
    * `maxDist`), middle→start at frame gap 1 (splitting, gated by
    * `splitDist` / SPLITTING_MAX_DISTANCE likewise). Middle→middle
    * pairs belong to NO TrackMate block and are never candidates.
    * All blocks are solved together by [[assignEdges]] (weight
    * 2A − cost, exact per component), so a start goes to the gap-close
    * OR the split source that the GLOBAL optimum prefers, never both.
    * The no-link ALTERNATIVE COST A is shared across blocks, exactly
    * as in TrackMate's one-alternative segment matrix. Its value:
    * with `altCostFactor` set (TrackMate's
    * ALTERNATIVE_LINKING_COST_FACTOR — every reference template sets
    * 1.05 with CUTOFF_PERCENTILE 0.9), A = factor ·
    * percentile(all gated candidate costs of the video's matrix,
    * `cutoffPercentile`) — the Jaqaman conditioning that rejects
    * OUTLIER-cost links even when they pass their gate (2A < cost ⇒
    * leaving both ends unlinked is cheaper); with it unset, A =
    * maxDist² (the gate bound — the engine's historical default,
    * where a split/merge gate above √2·maxDist admits candidates the
    * alternative then dominates; the reference templates keep both
    * gates well below the gap gate, where that rule is inert).
    *
    * Each block carries its OWN feature-penalty map (TrackMate's
    * GAP_CLOSING/SPLITTING/MERGING_FEATURE_PENALTIES — every one of
    * the reference's ten templates enables merging with
    * `MERGING_FEATURE_PENALTIES: {"AREA": 0.5}`, templates/cyto3.json):
    * a candidate's cost is d² · (1 + Σ 3·w·|f_p − f_c| / (f_p + f_c))²
    * ([[penalizedCost]], the same formula as the linking phase), and —
    * matching TrackMate's segment cost matrix, which thresholds the
    * COST — the block gate applies to the PENALIZED cost, so a nearby
    * candidate with a very different feature value can fall out of the
    * block entirely. With empty maps cost = d² and the gate reduces to
    * the geometric one (bit-identical to the pre-penalty behavior).
    * The emitted `dist` stays the geometric distance.
    *
    * Label semantics are deliberately unchanged by split/merge links:
    * the engine's (and reference pipeline's) track identity rules make
    * a split daughter a FRESH track and end a merging chain at the
    * merge (parse_xml.py:147-158) — so these links are LINEAGE EDGES
    * (kind = split/merge), while relabeling ([[closeGaps]]) consumes
    * only the gap-close links. Output: (src, dst, gap, dist, kind,
    * src_track, dst_track); kind in {gc, split, merge}.
    *
    * Same scale shape as [[gapClose]], except the per-video unit is
    * all SPOTS of the video (middles participate) — still bounded by
    * one timelapse, with the component decomposition keeping each
    * Hungarian small. */
  def gapCloseFull(spots: DataFrame, labels: DataFrame,
                   id: Column, frame: Column, x: Column, y: Column,
                   maxDist: Double, maxGap: Int,
                   videoOf: Long => Long,
                   allowSplit: Boolean = true,
                   allowMerge: Boolean = true,
                   splitDist: Option[Double] = None,
                   mergeDist: Option[Double] = None,
                   gapPenalties: Seq[(Column, Double)] = Nil,
                   splitPenalties: Seq[(Column, Double)] = Nil,
                   mergePenalties: Seq[(Column, Double)] = Nil,
                   altCostFactor: Option[Double] = None,
                   cutoffPercentile: Double = 0.9): DataFrame = {
    require(maxDist > 0.0, "maxDist must be positive")
    require(maxGap >= 1, "maxGap must be >= 1")
    require(splitDist.forall(_ > 0.0), "splitDist must be positive")
    require(mergeDist.forall(_ > 0.0), "mergeDist must be positive")
    require(altCostFactor.forall(_ > 0.0), "altCostFactor must be positive")
    require(cutoffPercentile > 0.0 && cutoffPercentile <= 1.0,
      "cutoffPercentile in (0, 1]")
    val spark = spots.sparkSession
    import spark.implicits._
    val maxD2 = maxDist * maxDist
    val splitD2 = splitDist.map(d => d * d).getOrElse(maxD2)
    val mergeD2 = mergeDist.map(d => d * d).getOrElse(maxD2)
    // one shared feature array = the concatenation of the three maps'
    // columns; each block's weight vector is zero outside its own
    // slice, so a feature another block penalizes contributes exactly
    // nothing here (penalty terms are weight-linear)
    val allPens = gapPenalties ++ splitPenalties ++ mergePenalties
    val nG = gapPenalties.length
    val nS = splitPenalties.length
    def blockW(lo: Int, ws: Seq[(Column, Double)]): Array[Double] = {
      val w = new Array[Double](allPens.length)
      var i = 0
      while (i < ws.length) { w(lo + i) = ws(i)._2; i += 1 }
      w
    }
    val wGap = blockW(0, gapPenalties)
    val wSplit = blockW(nG, splitPenalties)
    val wMerge = blockW(nG + nS, mergePenalties)
    val hasPens = allPens.nonEmpty // Columns must not reach the closure
    val featArr =
      if (allPens.isEmpty) typedLit(Array.empty[Double])
      else array(allPens.map(_._1.cast("double")): _*)
    val rows = spots.select(id.cast("long").as("id"), frame.cast("long").as("frame"),
        x.cast("double").as("x"), y.cast("double").as("y"), featArr.as("fs"))
      .join(labels.select(col("id").cast("long").as("id"),
        col("track_id").cast("long").as("track")), Seq("id"))
      .select(col("track"), col("id"), col("frame"), col("x"), col("y"), col("fs"))
      .as[TSpot]
    rows.groupByKey(r => videoOf(r.track))
      .flatMapGroups { (_, it) =>
        val all = it.toArray
        // per-track endpoints: start = (min frame, min id), end =
        // (max frame, min id); everything else is a middle
        val byTrack = all.groupBy(_.track)
        val startOf = byTrack.view.mapValues(_.minBy(s => (s.frame, s.id))).toMap
        val endOf = byTrack.view.mapValues(_.maxBy(s => (s.frame, -s.id))).toMap
        val ends = byTrack.keys.toArray.sorted.map(endOf)
        val middles = all.filter(s =>
          startOf(s.track).id != s.id && endOf(s.track).id != s.id)
          .sortBy(_.id)
        val starts = byTrack.keys.toArray.sorted.map(startOf)
        // parents = ends ++ middles (split sources); children =
        // starts ++ middles (merge targets)
        val parents = ends ++ (if (allowSplit) middles else Array.empty[TSpot])
        val children = starts ++ (if (allowMerge) middles else Array.empty[TSpot])
        val pFs = parents.map(_.fs.toArray)
        val cFs = children.map(_.fs.toArray)
        val np = parents.length
        val nEnds = ends.length
        val nStarts = starts.length
        def d2Of(p: TSpot, c: TSpot): Double = {
          val dx = c.x - p.x
          val dy = c.y - p.y
          dx * dx + dy * dy
        }
        val edges = Array.newBuilder[(Int, Int, Double)]
        val d2s = new java.util.HashMap[Long, Double]()
        var pi = 0
        while (pi < np) {
          val p = parents(pi)
          val pIsEnd = pi < nEnds
          var ci = 0
          while (ci < children.length) {
            val c = children(ci)
            val cIsStart = ci < nStarts
            if (p.track != c.track) {
              val df = c.frame - p.frame
              // gap block: end->start within maxGap; split/merge
              // blocks: frame gap exactly 1 (TrackMate's contract);
              // middle->middle pairs belong to no block
              var gateD2 = -1.0
              var w: Array[Double] = null
              if (pIsEnd && cIsStart) {
                if (df >= 1 && df <= maxGap) { gateD2 = maxD2; w = wGap }
              } else if (df == 1) {
                if (pIsEnd) { gateD2 = mergeD2; w = wMerge }
                else if (cIsStart) { gateD2 = splitD2; w = wSplit }
                // middle -> middle: never a block
              }
              if (gateD2 >= 0.0) {
                val d2 = d2Of(p, c)
                // TrackMate's segment matrix gates on the PENALIZED
                // cost (== d2 when the block's map is empty)
                if (d2 <= gateD2) {
                  val cost =
                    if (!hasPens) d2
                    else penalizedCost(d2, pFs(pi), cFs(ci), w)
                  if (cost <= gateD2) {
                    edges += ((pi, ci, cost))
                    d2s.put(pi.toLong << 32 | ci.toLong, d2)
                  }
                }
              }
            }
            ci += 1
          }
          pi += 1
        }
        val es = edges.result()
        // the matrix-wide alternative cost: factor x percentile of the
        // gated candidate costs (TrackMate's segment-matrix
        // conditioning), or the gate bound when no factor is set
        val alt = altCostFactor match {
          case Some(f) if es.nonEmpty =>
            f * percentileTM(es.map(_._3), cutoffPercentile)
          case _ => maxD2
        }
        assignEdges(np, children.length, es, alt)
          .iterator.map { case (pi2, ci2, _) =>
            val p = parents(pi2)
            val c = children(ci2)
            val d2 = d2s.getOrDefault(pi2.toLong << 32 | ci2.toLong,
              Double.NaN)
            require(!d2.isNaN,
              s"assigned edge $pi2->$ci2 has no gated distance")
            val kind =
              if (pi2 < nEnds && ci2 < nStarts) "gc"
              else if (pi2 < nEnds) "merge"
              else "split"
            (p.id, c.id, c.frame - p.frame,
              graft.functions.Numeric.croundD(math.sqrt(d2), 4),
              kind, p.track, c.track)
          }
      }
      .toDF("src", "dst", "gap", "dist", "kind", "src_track", "dst_track")
  }

  /** Gap closing applied to the labels: run [[gapClose]], then relabel
    * every merged chain of segments to its minimum track id — the same
    * min-id-per-segment convention as `TrackAssignment`. The matched
    * segment pairs have in/out-degree <= 1 and point forward in time,
    * so the merge map comes from the chain-specialised pointer-doubling
    * labeler ([[ChainLabel]]), not generic CC. Output: (id, track_id)
    * for every input label row. */
  def closeGaps(spots: DataFrame, labels: DataFrame,
                id: Column, frame: Column, x: Column, y: Column,
                maxDist: Double, maxGap: Int,
                videoOf: Long => Long,
                altCostFactor: Option[Double] = None,
                cutoffPercentile: Double = 0.9,
                gapPenalties: Seq[(Column, Double)] = Nil): DataFrame = {
    val lb = labels.select(col("id").cast("long").as("id"),
      col("track_id").cast("long").as("track_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val links = gapClose(spots, lb, id, frame, x, y, maxDist, maxGap, videoOf,
      altCostFactor, cutoffPercentile, gapPenalties)
    val chain = links.select(col("src_track").as("src"), col("dst_track").as("dst"))
    val lbl = ChainLabel.heads(chain)
    val minT = lbl.groupBy(col("head")).agg(min(col("id")).as("_new"))
    val remap = lbl.join(minT, Seq("head"))
      .select(col("id").as("track_id"), col("_new"))
    // the returned relabel join is lb's last reader (gap-close and the
    // chain labeling above already materialized the cache)
    graft.functions.CacheRelease.afterNextExecution(lb)
    lb.join(remap, Seq("track_id"), "left")
      .select(col("id"), coalesce(col("_new"), col("track_id")).as("track_id"))
  }

  /** O(n³) Hungarian algorithm with row/column potentials (the
    * Jonker-Volgenant shortest-augmenting-path scheme): minimum-cost
    * perfect matching on a square matrix. Returns row -> column. */
  private[operators] def hungarian(cost: Array[Array[Double]]): Array[Int] = {
    val n = cost.length
    val u = new Array[Double](n + 1)
    val v = new Array[Double](n + 1)
    val p = new Array[Int](n + 1)
    val way = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(n + 1)(Double.PositiveInfinity)
      val used = new Array[Boolean](n + 1)
      var free = -1
      while (free == -1) {
        used(j0) = true
        val i0 = p(j0)
        var delta = Double.PositiveInfinity
        var j1 = -1
        var j = 1
        while (j <= n) {
          if (!used(j)) {
            val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= n) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
          j += 1
        }
        j0 = j1
        if (p(j0) == 0) free = j0
      }
      while (j0 != 0) { val j1 = way(j0); p(j0) = p(j1); j0 = j1 }
      i += 1
    }
    val ans = new Array[Int](n)
    var j = 1
    while (j <= n) { ans(p(j) - 1) = j - 1; j += 1 }
    ans
  }
}
