package graft

import org.apache.spark.sql.functions._
import graft.operators.LapLink

/** Exact frame-pair assignment vs brute-force optimal matching
  * (permutation enumeration), plus the classic case greedy/mutual-NN
  * linking gets wrong. */
class LapLinkSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: enumerate all gated matchings, return the best total
    * weight Σ(2L - d2). */
  private def bruteBestWeight(ps: Array[(Long, Double, Double)],
                              cs: Array[(Long, Double, Double)],
                              maxD2: Double): Double = {
    val gated = for {
      i <- ps.indices; j <- cs.indices
      d2 = { val dx = ps(i)._2 - cs(j)._2; val dy = ps(i)._3 - cs(j)._3; dx*dx + dy*dy }
      if d2 <= maxD2
    } yield (i, j, 2.0 * maxD2 - d2)
    def best(avail: List[(Int, Int, Double)], usedP: Set[Int], usedC: Set[Int]): Double =
      avail match {
        case Nil => 0.0
        case (i, j, w) :: rest =>
          val skip = best(rest, usedP, usedC)
          if (usedP(i) || usedC(j)) skip
          else math.max(skip, w + best(rest, usedP + i, usedC + j))
      }
    best(gated.toList, Set.empty, Set.empty)
  }

  private def weightOf(links: Seq[(Long, Long, Double)],
                       ps: Map[Long, (Double, Double)],
                       cs: Map[Long, (Double, Double)], maxD2: Double): Double =
    links.map { case (src, dst, _) =>
      val (px, py) = ps(src); val (cx, cy) = cs(dst)
      2.0 * maxD2 - ((px - cx) * (px - cx) + (py - cy) * (py - cy))
    }.sum

  test("achieves the brute-force optimal total weight on random instances") {
    val rnd = new scala.util.Random(5)
    for (trial <- 0 until 8) {
      val np = 2 + rnd.nextInt(3)
      val nc = 2 + rnd.nextInt(3)
      val ps = Array.tabulate(np)(i => (i.toLong, rnd.nextDouble() * 10, rnd.nextDouble() * 10))
      val cs = Array.tabulate(nc)(j => (100L + j, rnd.nextDouble() * 10, rnd.nextDouble() * 10))
      val maxD2 = 25.0
      val spots = ps.map(p => (p._1, 0L, p._2, p._3)) ++ cs.map(c => (c._1, 1L, c._2, c._3))
      val got = LapLink.frameToFrame(spots.toSeq.toDF("id", "frame", "x", "y"),
          col("id"), col("frame"), col("x"), col("y"), maxDist = 5.0)
        .as[(Long, Long, Double)].collect().toSeq
      // valid 1-1 gated matching achieving the optimal weight
      assert(got.map(_._1).distinct.size == got.size)
      assert(got.map(_._2).distinct.size == got.size)
      val w = weightOf(got, ps.map(p => p._1 -> ((p._2, p._3))).toMap,
        cs.map(c => c._1 -> ((c._2, c._3))).toMap, maxD2)
      val opt = bruteBestWeight(ps, cs, maxD2)
      assert(math.abs(w - opt) < 1e-9, s"trial $trial: got weight $w, optimal $opt")
    }
  }

  test("global assignment beats greedy: two links where mutual-NN finds one") {
    // P2 is both children's nearest, but the assignment P1-C1 + P2-C2
    // links everyone
    val spots = Seq(
      (1L, 0L, 0.0, 0.0), (2L, 0L, 4.0, 0.0),   // parents
      (11L, 1L, 3.0, 0.0), (12L, 1L, 7.0, 0.0)) // children
    val got = LapLink.frameToFrame(spots.toDF("id", "frame", "x", "y"),
        col("id"), col("frame"), col("x"), col("y"), maxDist = 5.0)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(got === Set((1L, 11L), (2L, 12L)))
  }

  test("multi-frame: each consecutive pair solved independently") {
    val spots = Seq(
      (1L, 0L, 0.0, 0.0), (2L, 1L, 1.0, 0.0), (3L, 2L, 2.0, 0.0),
      (9L, 5L, 50.0, 50.0)) // isolated frame: no successor spots
    val got = LapLink.frameToFrame(spots.toDF("id", "frame", "x", "y"),
        col("id"), col("frame"), col("x"), col("y"), maxDist = 2.0)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(got === Set((1L, 2L), (2L, 3L)))
  }
}
