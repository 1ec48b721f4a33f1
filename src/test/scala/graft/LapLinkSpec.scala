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

  test("feature penalties: a look-alike beats a nearer shape-changer") {
    // child C (area 10) between parents: A at distance 2 with area 10
    // (no penalty) and B at distance 1.5 with area 30 (relative
    // difference inflates cost: 1.5² · (1 + 3·1·20/40)² = 2.25 · 6.25
    // = 14.06 > A's 4) — pure distance links B, penalized links A
    val spots = Seq(
      (1L, 0L, 0.0, 0.0, 10.0),  // A
      (2L, 0L, 3.5, 0.0, 30.0),  // B
      (11L, 1L, 2.0, 0.0, 10.0)) // C
    val df = spots.toDF("id", "frame", "x", "y", "area")
    val plain = LapLink.frameToFrame(df, col("id"), col("frame"),
        col("x"), col("y"), maxDist = 5.0)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(plain === Set((2L, 11L)))
    val penalized = LapLink.frameToFrame(df, col("id"), col("frame"),
        col("x"), col("y"), maxDist = 5.0,
        featurePenalties = Seq(col("area") -> 1.0))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(penalized === Set((1L, 11L)))
  }

  test("feature penalties: a cost past the gate drops the candidate entirely") {
    // single geometrically-gated pair, but the penalty inflates its
    // cost past the gate² threshold (d²=1, areas 1 vs 99 at weight 3:
    // (1 + 9·98/100)² ≈ 96 > 25): as in TrackMate, whose linking
    // matrix checks the cost function's PENALIZED value against
    // costThreshold = maxDist², the pair is not a candidate at all
    val spots = Seq((1L, 0L, 0.0, 0.0, 1.0), (11L, 1L, 1.0, 0.0, 99.0))
    val got = LapLink.frameToFrame(
        spots.toDF("id", "frame", "x", "y", "area"),
        col("id"), col("frame"), col("x"), col("y"), maxDist = 5.0,
        featurePenalties = Seq(col("area") -> 3.0))
      .as[(Long, Long, Double)].collect()
    assert(got.isEmpty, s"got ${got.toSeq}")
    // a milder penalty landing UNDER the gate² keeps the link: d²=1,
    // areas 40 vs 60 at weight 3 → (1 + 3·3·20/100)² = 7.84 ≤ 25
    val mild = Seq((1L, 0L, 0.0, 0.0, 40.0), (11L, 1L, 1.0, 0.0, 60.0))
    val kept = LapLink.frameToFrame(
        mild.toDF("id", "frame", "x", "y", "area"),
        col("id"), col("frame"), col("x"), col("y"), maxDist = 5.0,
        featurePenalties = Seq(col("area") -> 3.0))
      .as[(Long, Long, Double)].collect()
    assert(kept.map(r => (r._1, r._2)).toSet === Set((1L, 11L)))
  }

  test("TMUtils-style interpolated percentile: hand-computed order statistics") {
    val xs = Array(5.0, 1.0, 3.0, 2.0, 4.0) // sorted: 1 2 3 4 5
    // pos = p·(n+1) = p·6, linear interpolation between neighbours
    assert(LapLink.percentileTM(xs, 0.5) === 3.0)          // pos 3.0
    assert(LapLink.percentileTM(xs, 0.25) === 1.5)         // pos 1.5
    assert(math.abs(LapLink.percentileTM(xs, 0.9) - 5.0) < 1e-12) // pos 5.4 clamps to max
    assert(LapLink.percentileTM(xs, 1.0) === 5.0)          // factor·max short-circuit
    assert(LapLink.percentileTM(Array(7.0), 0.3) === 7.0)  // single value
    assert(LapLink.percentileTM(Array(2.0, 10.0), 0.1) === 2.0) // pos 0.3 clamps to min
    // the nearest-rank definition would differ here: ceil(0.9·5)=5th=5
    // vs interpolated 5.0 agree, but ceil(0.25·5)=2nd=2 vs 1.5 do not
  }

  test("an explicit sub-1 cutoff percentile refuses a planted within-gate outlier") {
    // 19 cheap pairs (d²=1) and one expensive-but-gated pair (d²=49,
    // gate 100): the operator surface allows conditioning this phase
    // at p90 — A = 1.05 · interp-p90 ≈ 1.05, 2A ≈ 2.1 < 49 drops the
    // outlier; TrackMate's own linking phase (percentile 1.0, the
    // default here) keeps it
    val spots = (0 to 19).flatMap { i =>
      val off = if (i == 19) 7.0 else 1.0
      Seq((10L * i + 1, 0L, i * 100.0, 0.0), (10L * i + 2, 1L, i * 100.0, off))
    }.toDF("id", "frame", "x", "y")
    def links(p: Double): Set[(Long, Long)] =
      LapLink.frameToFrame(spots, col("id"), col("frame"),
          col("x"), col("y"), maxDist = 10.0,
          altCostFactor = Some(1.05), cutoffPercentile = p)
        .select("src", "dst").as[(Long, Long)].collect().toSet
    val all = (0 to 19).map(i => (10L * i + 1, 10L * i + 2)).toSet
    assert(links(1.0) === all, "percentile 1.0 = factor·max keeps every link")
    assert(links(0.9) === all - ((191L, 192L)),
      "p90 conditioning must refuse exactly the outlier")
  }

  test("empty penalties: identical to the pure-distance assignment") {
    val rnd = new scala.util.Random(13)
    val spots = (0 until 30).map(i =>
      (i.toLong, (i % 3).toLong, rnd.nextDouble() * 12, rnd.nextDouble() * 12))
    val df = spots.toDF("id", "frame", "x", "y")
    val a = LapLink.frameToFrame(df, col("id"), col("frame"),
        col("x"), col("y"), maxDist = 6.0)
      .as[(Long, Long, Double)].collect().toSet
    val b = LapLink.frameToFrame(df.withColumn("f", col("x") * 2),
        col("id"), col("frame"), col("x"), col("y"), maxDist = 6.0,
        featurePenalties = Seq(col("f") -> 0.0))
      .as[(Long, Long, Double)].collect().toSet
    assert(a === b)
  }
}
