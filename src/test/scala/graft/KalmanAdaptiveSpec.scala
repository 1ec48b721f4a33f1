package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{ATail, KalmanAdaptive, KalmanLink}
import graft.streaming.{KalmanStream, SpotPos, TrackSpotOut}

/** Full-covariance adaptive-gain Kalman tracking: filter-math
  * properties (covariance contraction, velocity convergence), the
  * noisy-walker case fixed-gain loses, crossing identity, and
  * batch/stream parity. */
class KalmanAdaptiveSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def runStream(batches: Seq[Seq[SpotPos]], maxDist: Double,
                        gap: Int): Map[Long, Long] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"kalman_adaptive_$n"
    val stream = MemoryStream[SpotPos]
    val q = KalmanStream.adaptiveTracksStream(stream.toDS(), maxDist, gap,
        idleTimeoutMs = 0L)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[TrackSpotOut].collect().map(o => o.id -> o.track_id).toMap
  }

  test("filter math: consistent observations contract the covariance and learn velocity") {
    // single walker, true velocity (+3, 0), exact measurements
    var tails = Map.empty[Long, ATail]
    (0 to 10).foreach { f =>
      val (nt, _) = KalmanAdaptive.step(tails, f.toLong,
        Array(((100 + f).toLong, f * 3.0, 5.0)), maxD2 = 100.0, gapFrames = 1,
        q = 0.5, r = 1.0, v0 = 10.0)
      tails = nt
    }
    val t = tails.values.head
    // velocity estimate converged to the true velocity
    assert(math.abs(t.s(2) - 3.0) < 0.1, s"vx=${t.s(2)}")
    assert(math.abs(t.s(3) - 0.0) < 0.1, s"vy=${t.s(3)}")
    // position covariance contracted far below its r²+v0² start
    assert(t.p(0) < 1.0, s"P00=${t.p(0)}")
    assert(t.p(10) < 1.0, s"Pvxvx=${t.p(10)}")
    // covariance stays symmetric (numerical sanity)
    for (i <- 0 until 4; j <- 0 until 4)
      assert(math.abs(t.p(4 * i + j) - t.p(4 * j + i)) < 1e-9)
  }

  test("zig-zag measurement noise: adaptive keeps one track where fixed gain splits") {
    // true motion +2/frame (inside the gate, so both trackers link
    // the cold start); after a clean 8-frame prefix, measurements
    // alternate ±1.2 around truth. Fixed gain takes velocity = LAST
    // displacement, which swings 2±2.4, so its next prediction lands
    // up to ~3.6 from the next measurement — past the 2.5 gate, and
    // the track fragments.
    // The adaptive filter's converged covariance keeps the gain small:
    // the velocity estimate stays near +2, the position estimate stays
    // near the zero-mean truth line, and every innovation fits the
    // gate.
    val spots = (0 to 19).map { f =>
      val noise = if (f < 8) 0.0 else if (f % 2 == 0) 1.2 else -1.2
      ((100 + f).toLong, f.toLong, f * 2.0 + noise, 5.0)
    }
    val df = spots.toDF("id", "frame", "x", "y")
    val adaptive = KalmanAdaptive.tracks(df, col("id"), col("frame"),
        col("x"), col("y"), maxDist = 2.5, gapFrames = 1, _ => 0L,
        processNoise = 0.1, measurementNoise = 2.0)
      .as[(Long, Long)].collect().toMap
    val fixed = KalmanLink.tracks(df, col("id"), col("frame"),
        col("x"), col("y"), maxDist = 2.5, gapFrames = 1, _ => 0L)
      .as[(Long, Long)].collect().toMap
    assert(adaptive.values.toSet.size == 1,
      s"adaptive split the noisy walker: $adaptive")
    assert(fixed.values.toSet.size > 1,
      s"expected the fixed-gain tracker to fragment here: $fixed")
  }

  test("crossing cells keep their identities") {
    val spots = (0 to 10).flatMap { f =>
      Seq((100L + f, f.toLong, f * 2.0, 10.0),
          (200L + f, f.toLong, 21.0 - f * 2.0, 10.0))
    }
    val got = KalmanAdaptive.tracks(spots.toDF("id", "frame", "x", "y"),
        col("id"), col("frame"), col("x"), col("y"),
        maxDist = 2.2, gapFrames = 1, _ => 0L)
      .as[(Long, Long)].collect().toMap
    val aT = (0 to 10).map(f => got(100L + f)).toSet
    val bT = (0 to 10).map(f => got(200L + f)).toSet
    assert(aT.size == 1 && bT.size == 1 && aT != bT, s"crossing broke: $got")
  }

  test("batch equals stream on random multi-video walks") {
    val rnd = new scala.util.Random(47)
    val spots = for {
      v <- 0L to 2L
      w <- 0 until 3
      f <- 0 until 12
      if rnd.nextDouble() >= 0.1
    } yield SpotPos(v, f.toLong, v * 100000L + w * 1000L + f,
      w * 40.0 + f * 1.1 + rnd.nextDouble() * 0.8,
      v * 10.0 + rnd.nextDouble() * 0.8)
    val batch = KalmanAdaptive.tracks(
        spots.map(s => (s.id, s.frame, s.x, s.y)).toDF("id", "frame", "x", "y"),
        col("id"), col("frame"), col("x"), col("y"),
        maxDist = 4.0, gapFrames = 2, _ / 100000L)
      .as[(Long, Long)].collect().toMap
    val streamed = runStream(
      spots.groupBy(_.frame).toSeq.sortBy(_._1).map(_._2.toSeq),
      maxDist = 4.0, gap = 2)
    assert(batch === streamed)
  }
}
