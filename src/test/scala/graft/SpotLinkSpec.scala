package graft

import org.apache.spark.sql.functions._
import graft.operators.{SpotLink, TrackAssignment}

/** SpotLink.nearest vs a brute-force linker on random walks, plus the
  * composed chain positions -> link -> divisionAware -> tracks. */
class SpotLinkSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: every (child, parent) pair across all allowed gaps,
    * ranked by (gap, d2, src); no grid, no pruning. */
  private def bruteLink(spots: Seq[(Long, Long, Double, Double)],
                        maxDist: Double, gapFrames: Int): Set[(Long, Long, Long)] = {
    val byId = spots.map(s => s._1 -> s).toMap
    spots.flatMap { case (did, df, dx, dy) =>
      val cands = spots.filter { case (_, pf, _, _) =>
        pf >= df - gapFrames && pf < df
      }.flatMap { case (sid, pf, px, py) =>
        val d2 = (dx - px) * (dx - px) + (dy - py) * (dy - py)
        if (d2 <= maxDist * maxDist) Some((df - pf, d2, sid)) else None
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
