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
  */
object LapLink {

  def frameToFrame(spots: DataFrame, id: Column, frame: Column,
                   x: Column, y: Column, maxDist: Double): DataFrame = {
    require(maxDist > 0.0, "maxDist must be positive")
    val spark = spots.sparkSession
    import spark.implicits._
    val s = spots.select(id.cast("long").as("id"), frame.cast("long").as("frame"),
      x.cast("double").as("x"), y.cast("double").as("y"))
    val asParent = s.select(col("frame").as("pair"), lit(0).as("role"),
      col("id"), col("x"), col("y"))
    val asChild = s.select((col("frame") - 1).as("pair"), lit(1).as("role"),
      col("id"), col("x"), col("y"))
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
      .as[(Long, Int, Long, Double, Double)]
      .mapPartitions { it =>
        // rows arrive sorted by pair (Spark's sort spills, unlike a
        // per-partition HashMap of every group), so consecutive-key
        // grouping bounds task memory to ONE frame pair's spots
        val buf = it.buffered
        new Iterator[Iterator[(Long, Long, Double)]] {
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[(Long, Long, Double)] = {
            val pair = buf.head._1
            val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
            while (buf.hasNext && buf.head._1 == pair) {
              val r = buf.next()
              rows.append((r._2, r._3, r._4, r._5))
            }
            val ps = rows.filter(_._1 == 0).map(r => (r._2, r._3, r._4)).sortBy(_._1).toArray
            val cs = rows.filter(_._1 == 1).map(r => (r._2, r._3, r._4)).sortBy(_._1).toArray
            if (ps.isEmpty || cs.isEmpty) Iterator.empty
            else solve(ps, cs, maxD2).iterator.map { case (pi, ci, d2) =>
              (ps(pi)._1, cs(ci)._1, graft.functions.Numeric.croundD(math.sqrt(d2), 4))
            }
          }
        }.flatten
      }.toDF("src", "dst", "dist")
  }

  /** Gated max-weight matching — the "sparse" in SparseLAP: the gated
    * bipartite graph decomposes into connected components (no gated
    * edge crosses them and dummy alternatives are free, so the global
    * optimum is exactly the union of per-component optima), and each
    * component gets its own Hungarian solve. Dense frames with a local
    * gate split into many small solves — O(Σ mᵢ³) instead of O(m³). */
  private[operators] def solve(ps: Array[(Long, Double, Double)],
                               cs: Array[(Long, Double, Double)],
                               maxD2: Double): Seq[(Int, Int, Double)] = {
    val np = ps.length
    val nc = cs.length
    // union-find over parent nodes [0, np) and child nodes [np, np+nc)
    val parent = Array.tabulate(np + nc)(identity)
    def find(a: Int): Int = {
      var x = a
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    val gated = Array.newBuilder[(Int, Int)]
    var pi = 0
    while (pi < np) {
      var ci = 0
      while (ci < nc) {
        val dx = ps(pi)._2 - cs(ci)._2
        val dy = ps(pi)._3 - cs(ci)._3
        if (dx * dx + dy * dy <= maxD2) {
          gated += ((pi, ci))
          val (rp, rc) = (find(pi), find(np + ci))
          if (rp != rc) parent(rp) = rc
        }
        ci += 1
      }
      pi += 1
    }
    gated.result().groupBy { case (p, _) => find(p) }.iterator.flatMap { case (_, edges) =>
      val cps = edges.map(_._1).distinct.sorted
      val ccs = edges.map(_._2).distinct.sorted
      solveComponent(cps.map(ps), ccs.map(cs), maxD2)
        .map { case (i, j, d2) => (cps(i), ccs(j), d2) }
    }.toSeq
  }

  /** Hungarian on one component's dummy-padded square matrix:
    * real-real gated cells cost d2 - 2L (attractive), every dummy
    * pairing costs 0, ungated real-real cells are big (never preferred
    * over the 0-cost dummy). Returns (parentIdx, childIdx, d2). */
  private def solveComponent(ps: Array[(Long, Double, Double)],
                             cs: Array[(Long, Double, Double)],
                             maxD2: Double): Seq[(Int, Int, Double)] = {
    val np = ps.length
    val nc = cs.length
    val m = np + nc
    // an ungated cell must never appear in an optimum: the all-dummy
    // matching costs 0 and real links are >= -2L each, so any matching
    // through one ungated cell costs >= big - 2L·m; big = 2L(m+1)
    // makes that strictly positive — dominated by the 0-cost reroute.
    val big = 2.0 * maxD2 * (m + 1)
    val cost = Array.ofDim[Double](m, m)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < m) {
        cost(i)(j) =
          if (i < np && j < nc) {
            val dx = ps(i)._2 - cs(j)._2
            val dy = ps(i)._3 - cs(j)._3
            val d2 = dx * dx + dy * dy
            if (d2 <= maxD2) d2 - 2.0 * maxD2 else big
          } else 0.0
        j += 1
      }
      i += 1
    }
    val rowToCol = hungarian(cost)
    (0 until np).flatMap { pi =>
      val ci = rowToCol(pi)
      if (ci < nc) {
        val dx = ps(pi)._2 - cs(ci)._2
        val dy = ps(pi)._3 - cs(ci)._3
        val d2 = dx * dx + dy * dy
        if (d2 <= maxD2) Some((pi, ci, d2)) else None
      } else None
    }
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
