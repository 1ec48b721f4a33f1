package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{KalmanLink, SpotLink, TrackAssignment}
import graft.streaming.{KalmanStream, SpotPos, TrackSpotOut}

/** Batch Kalman-gated linking: parity with the streaming form on the
  * same arrivals (the per-frame transition is shared code, but the
  * cogroup plumbing around it is not), plus the crossing-identity case
  * that last-position NN linking gets wrong. */
class KalmanLinkSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def runStream(batches: Seq[Seq[SpotPos]], maxDist: Double,
                        gap: Int): Map[Long, Long] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"kalman_batchparity_$n"
    val stream = MemoryStream[SpotPos]
    val q = KalmanStream.kalmanTracksStream(stream.toDS(), maxDist, gap, idleTimeoutMs = 0L)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[TrackSpotOut].collect().map(o => o.id -> o.track_id).toMap
  }

  test("batch equals stream on random multi-video walks") {
    val rnd = new scala.util.Random(31)
    // ids encode the video (vid*1000+...) so videoOf is a pure function
    val spots = for {
      v <- 0L to 2L
      w <- 0 until 4
      f <- 0 until 15
      if rnd.nextDouble() >= 0.1
    } yield SpotPos(v, f.toLong, v * 100000L + w * 1000L + f,
      w * 40.0 + f * 1.1 + rnd.nextDouble() * 0.8,
      v * 10.0 + rnd.nextDouble() * 0.8)
    val batch = KalmanLink.tracks(
        spots.map(s => (s.id, s.frame, s.x, s.y)).toDF("id", "frame", "x", "y"),
        col("id"), col("frame"), col("x"), col("y"),
        maxDist = 4.0, gapFrames = 2, _ / 100000L)
      .as[(Long, Long)].collect().toMap
    val streamed = runStream(
      spots.groupBy(_.frame).toSeq.sortBy(_._1).map(_._2.toSeq),
      maxDist = 4.0, gap = 2)
    assert(batch === streamed)
  }

  test("crossing cells: Kalman keeps identities, NN linking swaps them") {
    // A walks +2/frame from x=0, B walks -2/frame from x=21 on one y
    // line; they pass between frames 5 and 6. NN-from-last-position
    // links A6 (x=12) to B5 (x=11) — the swap — while the velocity
    // prediction keeps each walker on its own track.
    val spots = (0 to 10).flatMap { f =>
      Seq((100L + f, f.toLong, f * 2.0, 10.0),
          (200L + f, f.toLong, 21.0 - f * 2.0, 10.0))
    }
    val df = spots.toDF("id", "frame", "x", "y")
    val kalman = KalmanLink.tracks(df, col("id"), col("frame"), col("x"), col("y"),
        maxDist = 2.2, gapFrames = 1, _ => 0L)
      .as[(Long, Long)].collect().toMap
    val aT = (0 to 10).map(f => kalman(100L + f)).toSet
    val bT = (0 to 10).map(f => kalman(200L + f)).toSet
    assert(aT.size == 1 && bT.size == 1 && aT != bT,
      s"kalman split/merged the crossing walkers: $kalman")
    // the NN chain on the same spots mixes the walkers' spots
    val edges = SpotLink.nearest(df, col("id"), col("frame"), col("x"), col("y"),
      maxDist = 2.2, gapFrames = 1)
    val nn = TrackAssignment.divisionAwareByVideo(df.select("id", "frame"),
        edges.select("src", "dst"), _ => 0L)
      .as[(Long, Long)].collect().toMap
    val pureNnTracks = nn.groupBy(_._2).values
      .forall(g => g.map(_._1 / 100L).toSet.size == 1)
    assert(!pureNnTracks, s"expected NN to mix the crossing walkers: $nn")
  }

  test("every spot gets an assignment; isolated spots are their own track") {
    val spots = Seq((1L, 0L, 0.0, 0.0), (2L, 1L, 1.0, 0.0), (9L, 5L, 80.0, 80.0))
    val got = KalmanLink.tracks(spots.toDF("id", "frame", "x", "y"),
        col("id"), col("frame"), col("x"), col("y"), 3.0, 1, _ => 0L)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
  }
}
