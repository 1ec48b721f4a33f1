package graft

import org.apache.spark.sql.functions._
import graft.operators.{SpotLink, TrackAssignment}

/** SpotLink.nearest vs a brute-force linker on random walks, plus the
  * composed chain positions -> link -> divisionAware -> tracks. */
class SpotLinkSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: every (child, parent) pair across all allowed gaps,
    * ranked by (gap, quantized d2, src) — the operator's declared
    * packed ordering; no grid, no pruning. */
  private def q4(d2: Double): Long =
    math.floor(d2 * graft.operators.SpotLink.D2Scale + 0.5).toLong

  private def bruteLink(spots: Seq[(Long, Long, Double, Double)],
                        maxDist: Double, gapFrames: Int): Set[(Long, Long, Long)] = {
    spots.flatMap { case (did, df, dx, dy) =>
      val cands = spots.filter { case (_, pf, _, _) =>
        pf >= df - gapFrames && pf < df
      }.flatMap { case (sid, pf, px, py) =>
        val d2 = (dx - px) * (dx - px) + (dy - py) * (dy - py)
        if (d2 <= maxDist * maxDist) Some((df - pf, q4(d2), sid)) else None
      }
      if (cands.isEmpty) None
      else {
        val (g, _, sid) = cands.min
        Some((sid, did, g))
      }
    }.toSet
  }

  private def runLink(spots: Seq[(Long, Long, Double, Double)],
                      maxDist: Double, gapFrames: Int): Set[(Long, Long, Long)] =
    SpotLink.nearest(spots.toDF("id", "frame", "x", "y"),
        col("id"), col("frame"), col("x"), col("y"), maxDist, gapFrames)
      .select("src", "dst", "gap").as[(Long, Long, Long)].collect().toSet

  test("matches brute force on random walks") {
    val rnd = new scala.util.Random(42)
    // 30 walkers, 40 frames, some walkers skip frames (gap links), some
    // teleport (out-of-range: no link)
    val spots = for {
      w <- 0 until 30
      f <- 0 until 40
      if !(rnd.nextDouble() < 0.15) // 15% dropout
    } yield {
      val x = (w % 6) * 40.0 + f * 0.7 + rnd.nextDouble() * 4.0
      val y = (w / 6) * 35.0 + rnd.nextDouble() * 4.0
      ((w.toLong * 1000L) + f, f.toLong, x, y)
    }
    for (gap <- Seq(1, 2, 3)) {
      assert(runLink(spots, 12.0, gap) === bruteLink(spots, 12.0, gap),
        s"gapFrames=$gap")
    }
  }

  test("cell-boundary candidates are found (neighbour-cell probe)") {
    // parent and child straddle a grid cell boundary at x=10.0 with
    // maxDist=10: same-cell-only probing would miss the link
    val spots = Seq((1L, 0L, 9.9, 5.0), (2L, 1L, 10.1, 5.0))
    assert(runLink(spots, 10.0, 1) === Set((1L, 2L, 1L)))
  }

  test("prefers smaller gap over smaller distance") {
    // parent at gap 1 (dist 8) vs parent at gap 2 (dist 1): gap wins
    val spots = Seq((1L, 0L, 0.0, 0.0), (2L, 1L, 8.0, 0.0), (3L, 2L, 0.0, 1.0))
    val links = runLink(spots, 10.0, 2)
    assert(links.contains((2L, 3L, 1L))) // not (1L, 3L, 2L)
  }

  test("division: two children link to one parent; divisionAware splits") {
    // one parent, two children next frame, both within range; then each
    // child continues one more frame
    val spots = Seq(
      (10L, 0L, 50.0, 50.0),
      (21L, 1L, 48.0, 50.0), (22L, 1L, 53.0, 50.0),
      (31L, 2L, 47.0, 50.0), (32L, 2L, 54.0, 50.0))
    val edges = SpotLink.nearest(spots.toDF("id", "frame", "x", "y"),
      col("id"), col("frame"), col("x"), col("y"), 10.0, 1)
    assert(edges.select("src", "dst").as[(Long, Long)].collect().toSet ===
      Set((10L, 21L), (10L, 22L), (21L, 31L), (22L, 32L)))
    val tracks = TrackAssignment.divisionAware(
        spots.map(s => (s._1, s._2)).toDF("id", "frame"),
        edges.select("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // first child (21) continues the parent's track; 22 starts fresh
    assert(tracks(10L) === tracks(21L))
    assert(tracks(21L) === tracks(31L))
    assert(tracks(22L) === tracks(32L))
    assert(tracks(22L) !== tracks(10L))
  }

  test("out-of-range spots stay unlinked") {
    val spots = Seq((1L, 0L, 0.0, 0.0), (2L, 1L, 100.0, 100.0))
    assert(runLink(spots, 10.0, 1) === Set.empty)
  }

  /** Brute-force IoU linker: all pairs, no grid. */
  private def bruteOverlap(boxes: Seq[(Long, Long, Double, Double, Double, Double)],
                           minIou: Double, gapFrames: Int): Set[(Long, Long, Long)] = {
    boxes.flatMap { case (did, df, x0, x1, y0, y1) =>
      val cands = boxes.flatMap { case (sid, pf, px0, px1, py0, py1) =>
        if (pf < df - gapFrames || pf >= df) None
        else {
          val ix = math.min(x1, px1) - math.max(x0, px0)
          val iy = math.min(y1, py1) - math.max(y0, py0)
          val inter = if (ix > 0 && iy > 0) ix * iy else 0.0
          val iou = if (inter > 0)
            inter / ((x1 - x0) * (y1 - y0) + (px1 - px0) * (py1 - py0) - inter)
          else 0.0
          if (inter > 0 && iou >= minIou)
            // the operator's declared ordering: quantized IoU (1e-6,
            // the output resolution), inverted so ascending min = best
            Some((df - pf, 1000000L - math.floor(iou * 1e6 + 0.5).toLong, sid))
          else None
        }
      }
      if (cands.isEmpty) None else { val (g, _, sid) = cands.min; Some((sid, did, g)) }
    }.toSet
  }

  test("mutual-NN matching: subset of NN links, 1-1, brute-force parity") {
    val rnd = new scala.util.Random(99)
    val spots = for {
      w <- 0 until 25
      f <- 0 until 30
      if rnd.nextDouble() >= 0.15
    } yield ((w.toLong * 1000L) + f, f.toLong,
      (w % 5) * 35.0 + f * 0.6 + rnd.nextDouble() * 5.0,
      (w / 5) * 30.0 + rnd.nextDouble() * 5.0)
    val df = spots.toDF("id", "frame", "x", "y")
    val nn = graft.operators.SpotLink.nearest(df, col("id"), col("frame"),
        col("x"), col("y"), 12.0, 2)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    val mutual = graft.operators.SpotLink.mutualNearest(df, col("id"), col("frame"),
        col("x"), col("y"), 12.0, 2)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    // mutual pairs are exactly the NN pairs whose src is also the
    // child's choice in reverse — a subset, and 1-1 in both columns
    assert(mutual.subsetOf(nn))
    assert(mutual.map(_._1).size == mutual.size, "src side not 1-1")
    assert(mutual.map(_._2).size == mutual.size, "dst side not 1-1")
    // brute force: best-per-dst and best-per-src agree
    val bestFwd = bruteLink(spots, 12.0, 2)
    val bestBwd = spots.flatMap { case (sid, pf, px, py) =>
      val cands = spots.flatMap { case (did, df2, dx, dy) =>
        if (df2 <= pf || df2 > pf + 2) None
        else {
          val d2 = (dx - px) * (dx - px) + (dy - py) * (dy - py)
          if (d2 <= 144.0) Some((df2 - pf, q4(d2), did)) else None
        }
      }
      if (cands.isEmpty) None else { val (_, _, did) = cands.min; Some((sid, did)) }
    }.toSet
    val exp = bestFwd.map(e => (e._1, e._2)).intersect(bestBwd)
    assert(mutual === exp)
  }

  test("overlap linking matches brute force on random boxes") {
    val rnd = new scala.util.Random(7)
    val boxes = for {
      w <- 0 until 25
      f <- 0 until 20
      if rnd.nextDouble() >= 0.2
    } yield {
      val cx = (w % 5) * 30.0 + f * 0.5 + rnd.nextDouble() * 3.0
      val cy = (w / 5) * 25.0 + rnd.nextDouble() * 3.0
      val hw = 2.0 + rnd.nextDouble() * 4.0
      val hh = 2.0 + rnd.nextDouble() * 4.0
      ((w.toLong * 1000L) + f, f.toLong, cx - hw, cx + hw, cy - hh, cy + hh)
    }
    val df = boxes.toDF("id", "frame", "x0", "x1", "y0", "y1")
    for (gap <- Seq(1, 2)) {
      val got = graft.operators.SpotLink.overlap(df, col("id"), col("frame"),
          col("x0"), col("x1"), col("y0"), col("y1"),
          minIou = 0.05, cellSize = 8.0, gapFrames = gap)
        .select("src", "dst", "gap").as[(Long, Long, Long)].collect().toSet
      assert(got === bruteOverlap(boxes, 0.05, gap), s"gapFrames=$gap")
    }
  }

  test("overlap: highest IoU wins; disjoint boxes never link") {
    // child overlaps parent A (iou 1/3) more than parent B (tiny); C disjoint
    val boxes = Seq(
      (1L, 0L, 0.0, 10.0, 0.0, 10.0),   // A: big overlap
      (2L, 0L, 14.0, 24.0, 0.0, 10.0),  // B: 1-unit sliver overlap
      (3L, 0L, 50.0, 60.0, 50.0, 60.0), // C: disjoint
      (9L, 1L, 5.0, 15.0, 0.0, 10.0))   // child
    val got = graft.operators.SpotLink.overlap(
        boxes.toDF("id", "frame", "x0", "x1", "y0", "y1"),
        col("id"), col("frame"), col("x0"), col("x1"), col("y0"), col("y1"),
        minIou = 0.01, cellSize = 10.0, gapFrames = 1)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 9L)))
  }

  test("plan: one candidate join + one aggregate, three exchanges max") {
    val spots = (0 until 100).map(i => (i.toLong, (i % 10).toLong, i * 1.0, i * 2.0))
    val plan = SpotLink.nearest(spots.toDF("id", "frame", "x", "y"),
        col("id"), col("frame"), col("x"), col("y"), 25.0, 2)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange [a-z]*partitioning".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected <= 3 exchanges, got $exchanges in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"distance predicate must not degenerate to a cross join:\n$plan")
  }
}
