package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{KalmanStream, SpotPos, TrackSpotOut}

/** Constant-velocity gated tracking: identity through crossings (the
  * case plain NN linking gets wrong), gap recovery via prediction,
  * and fresh tracks on division conflicts. */
class KalmanStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  /** Feeds each element of `batches` as its own micro-batch, so state
    * genuinely crosses batch boundaries. */
  private def run(batches: Seq[Seq[SpotPos]], maxDist: Double,
                  gap: Int): Map[Long, Long] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"kalman_$n"
    val stream = MemoryStream[SpotPos]
    val q = KalmanStream.kalmanTracksStream(stream.toDS(), maxDist, gap, idleTimeoutMs = 0L)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[TrackSpotOut].collect().map(o => o.id -> o.track_id).toMap
  }

  test("crossing cells keep their identities via velocity prediction") {
    // A walks +2/frame from x=0, B walks -2/frame from x=21, same y:
    // they pass between frames 5 and 6 (A 10->12, B 11->9). Plain NN
    // from LAST positions would swap them (A6 at 12 is nearer B5 at 11
    // than A5 at 10); velocity prediction keeps each track straight.
    val spots = (0 to 10).flatMap { f =>
      Seq(SpotPos(1L, f.toLong, 100L + f, f * 2.0, 10.0),
          SpotPos(1L, f.toLong, 200L + f, 21.0 - f * 2.0, 10.0))
    }
    val got = run(spots.grouped(2).toSeq, maxDist = 2.2, gap = 1)
    val aTracks = (0 to 10).map(f => got(100L + f)).toSet
    val bTracks = (0 to 10).map(f => got(200L + f)).toSet
    assert(aTracks.size == 1, s"A split: $aTracks")
    assert(bTracks.size == 1, s"B split: $bTracks")
    assert(aTracks != bTracks)
  }

  test("prediction recovers across a missed frame") {
    // constant velocity +3/frame, frame 2 missing; with gap=2 the tail
    // predicts 2 frames ahead and relinks exactly (a last-position
    // linker would see a distance of 6, twice the gate)
    val spots = Seq(0, 1, 3, 4).map(f => SpotPos(1L, f.toLong, 10L + f, f * 3.0, 5.0))
    val got = run(spots.map(Seq(_)), maxDist = 3.5, gap = 2)
    assert(got.values.toSet.size == 1, s"track split: $got")
  }

  test("conflicting claims: min-id spot continues, the other starts fresh") {
    val spots = Seq(
      Seq(SpotPos(1L, 0L, 1L, 10.0, 10.0)),
      Seq(SpotPos(1L, 1L, 5L, 9.5, 10.0), SpotPos(1L, 1L, 6L, 10.5, 10.0)))
    val got = run(spots, maxDist = 2.0, gap = 1)
    assert(got(5L) == got(1L))
    assert(got(6L) == 6L)
  }
}
