package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Numeric.{cround, dsum}

/** Track-interaction detection — the cell-cell interaction question a
  * phenotyping pipeline asks after tracking (do neighboring cells
  * co-migrate?): every pair of tracks that comes within `maxDist` at
  * some shared frame, scored by the DIRECTIONAL CORRELATION of their
  * step-displacement series over shared frames — the cosine between
  * the concatenated (dx, dy) step vectors: +1 when the two tracks
  * move in lockstep, 0 when unrelated, -1 when anti-aligned.
  *
  * Scale shape — the two-phase candidate pattern every pair operator
  * here uses: phase 1 finds NEAR pairs with the grid-binned
  * same-frame join (cells of maxDist, 3x3 neighbor probes — exact by
  * coverage, no track-pair cross join anywhere); phase 2 joins only
  * the candidate pairs (a sliver) back to the per-track step series
  * for the full shared-frame compare. Correlation sums accumulate
  * decimal-quantized (scale 8), so the score is exact in any
  * aggregation order — what makes the operator DuckDB-oracle-exact.
  *
  * Input must carry ONE position per (track, frame) (callers collapse
  * duplicates first — the query layer picks the min-event position).
  * Steps are per-track frame-ordered deltas; `min_dist` is the
  * closest same-frame approach over the SHARED STEP frames the score
  * is computed on. */
object Interaction {

  /** `maxCellOccupancy` is the degenerate-density CONTRACT every other
    * pair generator in the engine carries (jaccardPairs' maxDf, the
    * MinHash bucketCap, EditJoin's degenerate-block gate): a single
    * (frame, cell) holding b spots contributes up to ~9·b² candidate
    * rows (its own cell plus the 8 neighbor probes), so one
    * degenerate-dense cell — all spots of a frame inside one maxDist
    * square, i.e. maxDist set far wider than the imaging field — goes
    * quadratic with no bound. Unlike the lexical generators, dropping
    * or star-capping candidates here would silently change the scored
    * pair set, so the contract is FAIL-FAST instead: any cell whose
    * occupancy exceeds the cap raises with the offending (frame,
    * cell) before the quadratic join runs. At the default 2048 the
    * worst single-cell block is ~9·2048² ≈ 38M candidate rows — the
    * outer edge of one task's budget; genuinely denser data means
    * shrinking maxDist (cells shrink with it) or raising the cap
    * knowingly. The check is a map-side partial-agg over the persisted
    * position table plus a broadcast join against the (normally
    * empty) overflow set — no sort, no extra shuffle of the spots. */
  def pairs(spots: DataFrame, track: Column, frame: Column,
            x: Column, y: Column, maxDist: Double,
            minShared: Int = 3, maxCellOccupancy: Int = 2048): DataFrame = {
    require(maxDist > 0.0, "maxDist must be positive")
    require(minShared >= 1, "minShared must be >= 1")
    require(maxCellOccupancy >= 1, "maxCellOccupancy must be >= 1")
    // the position table feeds FOUR plan branches (both grid join
    // sides and both step-series sides); persist it so an expensive
    // producer subtree (e.g. a JSON-parsing ingest) runs once —
    // released after the caller's action (the sweep rule)
    val s = spots.select(track.cast("long").as("t"), frame.cast("long").as("f"),
        x.cast("double").as("x"), y.cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.functions.CacheRelease.afterNextExecution(s)
    val w = Window.partitionBy("t").orderBy("f")
    val steps = s
      .withColumn("dx", col("x") - lag("x", 1).over(w))
      .withColumn("dy", col("y") - lag("y", 1).over(w))
      .filter(col("dx").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.functions.CacheRelease.afterNextExecution(steps)
    // phase 1: near candidate pairs via grid cells (3x3 probe)
    def cell(c: Column): Column = floor(c / maxDist).cast("long")
    // degenerate-density gate (see maxCellOccupancy above): overflowing
    // cells are a tiny (normally empty) set, broadcast onto the left
    // side where assert_true raises before the quadratic join executes
    val overflow = s
      .groupBy(col("f"), cell(col("x")).as("cx"), cell(col("y")).as("cy"))
      .agg(count(lit(1)).as("_occ"))
      .filter(col("_occ") > maxCellOccupancy)
    // the guard is FUSED into x1 (a column the distance filter always
    // consumes) rather than carried as a standalone asserted column,
    // so no optimizer rule can prune it away with the projection
    val left = s.select(col("t").as("u1"), col("f"),
        col("x").as("x1"), col("y").as("y1"),
        cell(col("x")).as("cx"), cell(col("y")).as("cy"))
      .join(broadcast(overflow), Seq("f", "cx", "cy"), "left")
      .withColumn("x1", when(col("_occ").isNull, col("x1"))
        .otherwise(raise_error(concat(
          lit("Interaction.pairs: "), col("_occ"),
          lit(" spots share one maxDist cell at frame "), col("f"),
          lit(" (cell "), col("cx"), lit(","), col("cy"),
          lit(s") exceeding maxCellOccupancy=$maxCellOccupancy — a " +
            "degenerate-dense cell goes quadratic; shrink maxDist, " +
            "pre-filter the frame, or raise the cap explicitly"))).cast("double")))
      .drop("_occ")
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct(lit(dx.toLong).as("ox"), lit(dy.toLong).as("oy"))): _*)
    val right = s.select(col("t").as("u2"), col("f"),
        col("x").as("x2"), col("y").as("y2"),
        cell(col("x")).as("_cx"), cell(col("y")).as("_cy"))
      .withColumn("_o", explode(offsets))
      .select(col("u2"), col("f"), col("x2"), col("y2"),
        (col("_cx") + col("_o.ox")).as("cx"), (col("_cy") + col("_o.oy")).as("cy"))
    // explicit-width repartition on the pair key for the dedup (r17,
    // the LapLink rule): the candidate-pair exchange is tiny in BYTES,
    // so AQE's size-based coalescing packs it — and with it the whole
    // CPU-dense phase 2 downstream (pair×steps expansion + the
    // correlation aggregate) — onto one thread (measured: a 3.3 s
    // single-task tail stage of q_interact's 5.6 s). An explicit
    // partition count is exempt from AQE coalescing; the following
    // distinct reuses this exchange's (u1, u2) hash partitioning, so
    // the plan still has exactly one pair-grain exchange.
    val width = spots.sparkSession.sparkContext.defaultParallelism
    val cand = left.join(right, Seq("f", "cx", "cy"))
      .filter(col("u1") < col("u2"))
      .filter((col("x1") - col("x2")) * (col("x1") - col("x2"))
        + (col("y1") - col("y2")) * (col("y1") - col("y2")) <= maxDist * maxDist)
      .select("u1", "u2").repartition(width, col("u1"), col("u2")).distinct()
    // phase 2: shared step frames of the candidate pairs only
    val a = steps.select(col("t").as("u1"), col("f"), col("x").as("xa"),
      col("y").as("ya"), col("dx").as("dxa"), col("dy").as("dya"))
    val b = steps.select(col("t").as("u2"), col("f"), col("x").as("xb"),
      col("y").as("yb"), col("dx").as("dxb"), col("dy").as("dyb"))
    cand.join(a, Seq("u1")).join(b, Seq("u2", "f"))
      .groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("n_shared"),
        min(sqrt((col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")))).as("_md"),
        dsum(col("dxa") * col("dxb") + col("dya") * col("dyb"), 8).as("_s"),
        dsum(col("dxa") * col("dxa") + col("dya") * col("dya"), 8).as("_sa"),
        dsum(col("dxb") * col("dxb") + col("dyb") * col("dyb"), 8).as("_sb"))
      .filter(col("n_shared") >= minShared)
      .select(col("u1"), col("u2"), col("n_shared"),
        cround(col("_md"), 4).as("min_dist"),
        cround(when(col("_sa") > 0.0 && col("_sb") > 0.0,
          col("_s") / (sqrt(col("_sa")) * sqrt(col("_sb"))))
          .otherwise(0.0), 6).as("dir_corr"))
  }
}
