package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Numeric.cround

/** Distance-bounded frame-to-frame nearest-neighbour spot linking — the
  * tracker stage itself (reference: bin/track_images.py:95-100 is a
  * factory over six TrackMate linking algorithms; this is the
  * NearestNeighbor end of that menu). Segmentation emits per-frame spot
  * centroids; linking turns them into lineage edges that
  * [[TrackAssignment.divisionAware]] consumes, closing the chain
  * positions -> edges -> tracks.
  *
  * Semantics (deterministic, engine-independent): each spot picks its
  * nearest predecessor among the previous `gapFrames` frames within
  * `maxDist` — candidates ordered by (gap, squared distance, source
  * id), so a direct previous-frame candidate always beats a gap link
  * and exact distance ties break on the smaller id. Children choose
  * parents: a parent may be chosen by several children (division edges
  * survive, and divisionAware splits them) while each child keeps
  * exactly one parent (merges are impossible by construction, matching
  * the reference's merge suppression, parse_xml.py:147-149).
  *
  * Scale shape: spots grid-bin into maxDist-sized cells; each spot
  * probes the 3x3 cell neighbourhood in each of the previous
  * `gapFrames` frames — a 9*gapFrames map-side fanout, so the distance
  * predicate never becomes a cross join. ONE shuffle joins probes to
  * parents on (frame, cell); ONE map-side-combining aggregate picks
  * each child's best candidate. Both keys are dense and uniform
  * at 100 TB: frames partition time, cells partition space, and the
  * fanout constant is independent of corpus size.
  *
  * Candidate ordering is PACKED: (gap, quantized d², id) fold into one
  * long so the argmin is a plain `min` — a hash aggregate with map-side
  * combine, where `min_by` over an ordering struct plans as
  * SortAggregate (partial + final sorts over the full candidate
  * fanout). The quantization (d² at 1/[[D2Scale]] resolution, ~0.01 in
  * distance at the default) is part of the declared semantics: exact
  * d² ties at that resolution break on the smaller source id. Both
  * engines of the oracle pair compute bit-identical doubles, so the
  * quantized rank is engine-independent.
  */
object SpotLink {

  /** d² quantization for candidate ranking: floor(d2 * D2Scale + 0.5).
    * 1e4 resolves 0.01-pixel distance differences at maxDist <= ~100 —
    * far below any physical centroid uncertainty. */
  val D2Scale: Double = 1e4

  /** Bit layout for the packed (gap, d2q, id) ordering atom:
    * gap in the top bits, quantized d² in the middle, id in the low
    * `idBits`. Returns (d2Bits, idBits). Fails loudly when the gate is
    * too wide to leave id room rather than wrapping silently. */
  private def packLayout(maxQ: Long, gapFrames: Int): (Int, Int) = {
    val gapBits = 64 - java.lang.Long.numberOfLeadingZeros(gapFrames.toLong)
    val d2Bits = 64 - java.lang.Long.numberOfLeadingZeros(maxQ + 1)
    val idBits = 63 - gapBits - d2Bits
    require(idBits >= 20,
      s"packed ordering needs id bits: gate too wide (d2Bits=$d2Bits, gapBits=$gapBits)")
    (d2Bits, idBits)
  }

  /** id guarded against the packed-id capacity: ids outside [0, mask]
    * would corrupt the ordering, so they raise instead. */
  private def guardId(id: Column, mask: Long): Column =
    when(id.between(0L, mask), id)
      .otherwise(raise_error(concat(
        lit(s"SpotLink: spot id outside packed range [0, $mask]: "),
        id.cast("string"))).cast("long"))

  /** Link spots (id, frame, x, y) into parent->child edges.
    * Output: (src, dst, gap, dist) — one row per linked child; dist is
    * the Euclidean distance (from quantized d²) rounded to 4 decimals. */
  def nearest(spots: DataFrame, id: Column, frame: Column, x: Column, y: Column,
              maxDist: Double, gapFrames: Int = 1): DataFrame = {
    val maxQ = (maxDist * maxDist * D2Scale).toLong + 1
    val (d2Bits, idBits) = packLayout(maxQ, gapFrames)
    val idMask = (1L << idBits) - 1
    val cand = candidates(spots, id, frame, x, y, maxDist, gapFrames)
      .withColumn("_pk",
        shiftleft(col("gap"), d2Bits + idBits) +
          shiftleft(floor(col("d2") * D2Scale + 0.5).cast("long"), idBits) +
          guardId(col("src"), idMask))
    cand.groupBy(col("dst"))
      .agg(min(col("_pk")).as("_pk"))
      .select(col("_pk").bitwiseAND(idMask).as("src"), col("dst"),
        shiftrightunsigned(col("_pk"), d2Bits + idBits).as("gap"),
        cround(sqrt(shiftrightunsigned(col("_pk"), idBits)
          .bitwiseAND((1L << d2Bits) - 1) / D2Scale), 4).as("dist"))
  }

  /** Mutual-nearest-neighbour 1-1 linking — the conservative
    * approximation of the reference's LAP trackers (track_images.py:
    * 95-100, SimpleSparseLAP/SparseLAP solve a per-frame-pair linear
    * assignment; mutual-NN keeps exactly the pairs every sensible
    * assignment contains: p is c's best predecessor AND c is p's best
    * successor). The result is a 1-1 matching — no divisions, no
    * merges — which is what LAP linking (without its split/merge
    * post-pass) produces.
    *
    * Cost: ONE spot-keyed shuffle for BOTH directions — each candidate
    * symmetrizes map-side into a forward record keyed by the child and
    * a backward record keyed by the parent (a Generate, not a second
    * pass), and one hash aggregate takes both packed argmins per spot.
    * The mutual check is then a semi-join of the two TINY per-spot
    * argmin projections. Nothing is persisted: the 9·gap candidate
    * fanout is consumed in a single streaming pass (the r5 shape
    * cached the full candidate set and aggregated it twice).
    * Output: (src, dst, gap, dist). */
  def mutualNearest(spots: DataFrame, id: Column, frame: Column, x: Column, y: Column,
                    maxDist: Double, gapFrames: Int = 1): DataFrame = {
    val maxQ = (maxDist * maxDist * D2Scale).toLong + 1
    val (d2Bits, idBits) = packLayout(maxQ, gapFrames)
    val idMask = (1L << idBits) - 1
    val hi = shiftleft(col("gap"), d2Bits + idBits) +
      shiftleft(floor(col("d2") * D2Scale + 0.5).cast("long"), idBits)
    val sym = candidates(spots, id, frame, x, y, maxDist, gapFrames)
      .select(explode(array(
        struct(col("dst").as("id"), lit(0).as("role"),
          (hi + guardId(col("src"), idMask)).as("pk")),
        struct(col("src").as("id"), lit(1).as("role"),
          (hi + guardId(col("dst"), idMask)).as("pk")))).as("e"))
      .select(col("e.id").as("id"), col("e.role").as("role"), col("e.pk").as("pk"))
    // per spot: best parent (fwd) and best child (bwd) in one aggregate
    val best = sym.groupBy(col("id"))
      .agg(min(when(col("role") === 0, col("pk"))).as("_bp"),
        min(when(col("role") === 1, col("pk"))).as("_bc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val asChild = best.filter(col("_bp").isNotNull)
      .select(col("id").as("dst"), col("_bp").bitwiseAND(idMask).as("src"),
        shiftrightunsigned(col("_bp"), d2Bits + idBits).as("gap"),
        shiftrightunsigned(col("_bp"), idBits).bitwiseAND((1L << d2Bits) - 1).as("_q"))
    val asParent = best.filter(col("_bc").isNotNull)
      .select(col("id").as("src"), col("_bc").bitwiseAND(idMask).as("dst"))
    // both semi-join sides read best inside the returned plan:
    // release after the caller's action (best-effort cleanup)
    graft.functions.CacheRelease.afterNextExecution(best)
    asChild.join(asParent, Seq("src", "dst"), "left_semi")
      .select(col("src"), col("dst"), col("gap"),
        cround(sqrt(col("_q") / D2Scale), 4).as("dist"))
  }

  /** Shared candidate generation for [[nearest]]/[[mutualNearest]]:
    * (dst, src, gap, d2) for every spot pair within `maxDist` across
    * 1..gapFrames frames. */
  private def candidates(spots: DataFrame, id: Column, frame: Column,
                         x: Column, y: Column,
                         maxDist: Double, gapFrames: Int): DataFrame = {
    require(maxDist > 0.0, "maxDist must be positive")
    require(gapFrames >= 1, "gapFrames must be >= 1")
    val s = spots.select(id.cast("long").as("id"), frame.cast("long").as("frame"),
      x.cast("double").as("x"), y.cast("double").as("y"))
    def cell(c: Column): Column = floor(c / maxDist).cast("long")
    val parents = s.select(col("id").as("src"), col("frame").as("pframe"),
      col("x").as("px"), col("y").as("py"),
      cell(col("x")).as("cx"), cell(col("y")).as("cy"))
    val probeOffsets = array((for {
      g <- 1 to gapFrames; dx <- -1 to 1; dy <- -1 to 1
    } yield struct(lit(g.toLong).as("g"), lit(dx.toLong).as("dx"),
      lit(dy.toLong).as("dy"))): _*)
    val probes = s
      .select(col("id").as("dst"), col("frame").as("cframe"), col("x"), col("y"),
        cell(col("x")).as("cx0"), cell(col("y")).as("cy0"),
        explode(probeOffsets).as("o"))
      .select(col("dst"), col("cframe"), col("x"), col("y"),
        (col("cframe") - col("o.g")).as("pframe"),
        (col("cx0") + col("o.dx")).as("cx"), (col("cy0") + col("o.dy")).as("cy"))
    val d2 = (col("x") - col("px")) * (col("x") - col("px")) +
      (col("y") - col("py")) * (col("y") - col("py"))
    // SHUFFLE_HASH, build = parents: at any scale both sides are the
    // corpus (neither is broadcastable — and Catalyst's size estimate
    // would otherwise BROADCAST the 9·gap-exploded probe side, a
    // driver-side collect of the larger relation); hashing the
    // un-exploded parents per partition beats sorting both sides, and
    // (frame, cell) keys are dense and uniform so AQE's skew split has
    // nothing to do in the common case.
    probes.join(parents.hint("shuffle_hash"), Seq("pframe", "cx", "cy"))
      .withColumn("d2", d2)
      .filter(col("d2") <= lit(maxDist * maxDist))
      .select(col("dst"), col("src"),
        (col("cframe") - col("pframe")).as("gap"), col("d2"))
  }

  /** IoU (Overlap-tracker) linking — the second end of the reference's
    * tracker menu (track_images.py:95-100, OverlapTrackerFactory):
    * link each spot to the predecessor whose bounding box overlaps its
    * own with the highest intersection-over-union >= `minIou`,
    * preferring the smallest frame gap. Input spots carry bboxes
    * (x0 <= x1, y0 <= y1) — e.g. `PolygonShape`'s min/max over an ROI.
    *
    * Candidate generation: each box registers every `cellSize` grid
    * cell it covers; two overlapping boxes always share a covered cell
    * (their intersection region lies in one), so
    * an equi-join on (frame, cell) finds every overlapping pair with
    * fanout bounded by boxes-per-cell (cellSize should be of the order
    * of a typical box — cells per box stays a small constant). Same
    * scale shape as [[nearest]]: one SHUFFLE_HASH join on dense
    * (frame, cell) keys, one min_by aggregate, no cross join.
    * Output: (src, dst, gap, iou) — one row per linked child. */
  def overlap(spots: DataFrame, id: Column, frame: Column,
              x0: Column, x1: Column, y0: Column, y1: Column,
              minIou: Double, cellSize: Double, gapFrames: Int = 1): DataFrame = {
    require(minIou > 0.0, "minIou must be positive")
    require(cellSize > 0.0, "cellSize must be positive")
    require(gapFrames >= 1, "gapFrames must be >= 1")
    val s = spots.select(id.cast("long").as("id"), frame.cast("long").as("frame"),
      x0.cast("double").as("x0"), x1.cast("double").as("x1"),
      y0.cast("double").as("y0"), y1.cast("double").as("y1"))
    // all (cx, cy) cells the box covers
    val cells = flatten(transform(
      sequence(floor(col("x0") / cellSize).cast("long"),
        floor(col("x1") / cellSize).cast("long")),
      cx => transform(
        sequence(floor(col("y0") / cellSize).cast("long"),
          floor(col("y1") / cellSize).cast("long")),
        cy => struct(cx.as("cx"), cy.as("cy")))))

    val parents = s
      .select(col("id").as("src"), col("frame").as("pframe"),
        col("x0").as("px0"), col("x1").as("px1"),
        col("y0").as("py0"), col("y1").as("py1"), explode(cells).as("c"))
      .select(col("src"), col("pframe"), col("px0"), col("px1"),
        col("py0"), col("py1"), col("c.cx").as("cx"), col("c.cy").as("cy"))
    val probes = s
      .select(col("id").as("dst"), col("frame").as("cframe"),
        col("x0"), col("x1"), col("y0"), col("y1"), explode(cells).as("c"))
      .select(col("dst"), col("cframe"), col("x0"), col("x1"), col("y0"), col("y1"),
        col("c.cx").as("cx"), col("c.cy").as("cy"),
        explode(array((1 to gapFrames).map(g => lit(g.toLong)): _*)).as("g"))
      .withColumn("pframe", col("cframe") - col("g"))

    val ix = least(col("x1"), col("px1")) - greatest(col("x0"), col("px0"))
    val iy = least(col("y1"), col("py1")) - greatest(col("y0"), col("py0"))
    val cand = probes.join(parents.hint("shuffle_hash"), Seq("pframe", "cx", "cy"))
      .withColumn("inter", when(ix > 0 && iy > 0, ix * iy).otherwise(lit(0.0)))
      .filter(col("inter") > 0)
      .withColumn("iou", col("inter") /
        ((col("x1") - col("x0")) * (col("y1") - col("y0")) +
          (col("px1") - col("px0")) * (col("py1") - col("py0")) - col("inter")))
      .filter(col("iou") >= minIou)
      .select(col("dst"), col("src"), col("g").as("gap"), col("iou"))

    // a pair sharing several cells yields identical candidate rows;
    // the packed min is insensitive to the duplicates, so no dedup
    // shuffle. IoU quantizes to 1e-6 (the output resolution) and packs
    // INVERTED so the ascending min realises (gap asc, iou desc,
    // src asc) — same hash-aggregate shape as [[nearest]].
    val iouQ = 1000000L
    val (iouBits, idBits) = packLayout(iouQ, gapFrames)
    val idMask = (1L << idBits) - 1
    cand
      .withColumn("_pk",
        shiftleft(col("gap"), iouBits + idBits) +
          shiftleft(lit(iouQ) - floor(col("iou") * iouQ + 0.5).cast("long"), idBits) +
          guardId(col("src"), idMask))
      .groupBy(col("dst"))
      .agg(min(col("_pk")).as("_pk"))
      .select(col("_pk").bitwiseAND(idMask).as("src"), col("dst"),
        shiftrightunsigned(col("_pk"), iouBits + idBits).as("gap"),
        ((lit(iouQ) - shiftrightunsigned(col("_pk"), idBits)
          .bitwiseAND((1L << iouBits) - 1)) / iouQ).as("iou"))
  }
}
