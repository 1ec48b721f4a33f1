package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{SpotLink, TrackAssignment}
import graft.streaming.{LinkTrackStream, SpotPos, TrackSpotOut}

/** The one-stage streaming tracker (positions -> tracks) vs the batch
  * composition SpotLink.nearest -> divisionAware. Compared as
  * PARTITIONS over the edge-incident universe (stream labels by head
  * id, batch by min id per segment; stream also assigns isolated
  * spots, which the batch operator drops by reference semantics). */
class LinkTrackStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def streamAssign(batches: Seq[Seq[SpotPos]], maxDist: Double,
                           gap: Int): Map[Long, Long] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"linktrack_$n"
    val stream = MemoryStream[SpotPos]
    if (batches.size == 1) {
      stream.addData(batches.head: _*)
      val q = LinkTrackStream.nearestTracksStream(stream.toDS(), maxDist, gap, idleTimeoutMs = 0L)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(60000), "query did not finish") finally q.stop()
    } else {
      val q = LinkTrackStream.nearestTracksStream(stream.toDS(), maxDist, gap, idleTimeoutMs = 0L)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    spark.table(name).as[TrackSpotOut].collect().map(o => o.id -> o.track_id).toMap
  }

  private def toPartition(assign: Map[Long, Long], universe: Set[Long]): Set[Set[Long]] =
    assign.filter(kv => universe(kv._1)).groupBy(_._2).values.map(_.keySet).toSet

  test("random walks with divisions: stream partition equals batch composition") {
    val rnd = new scala.util.Random(21)
    val spots = for {
      w <- 0 until 20
      f <- 0 until 25
      if rnd.nextDouble() >= 0.25 // heavy dropout creates gaps + shared parents
    } yield SpotPos(1L, f.toLong, (w.toLong * 1000L) + f,
      (w % 4) * 10.0 + f * 0.5 + rnd.nextDouble() * 7.0,
      (w / 4) * 9.0 + rnd.nextDouble() * 7.0)
    val df = spots.map(s => (s.id, s.frame, s.x, s.y)).toDF("id", "frame", "x", "y")
    val edges = SpotLink.nearest(df, col("id"), col("frame"), col("x"), col("y"), 12.0, 2)
    val edgePairs = edges.select("src", "dst").as[(Long, Long)].collect()
    // ensure the layout actually produced divisions (shared parents)
    assert(edgePairs.map(_._1).distinct.length < edgePairs.length, "no divisions generated")
    val universe = (edgePairs.map(_._1) ++ edgePairs.map(_._2)).toSet
    val exp = TrackAssignment.divisionAware(df.select("id", "frame"),
        edges.select("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val expPart = toPartition(exp, universe)
    val frames = spots.groupBy(_.frame).toSeq.sortBy(_._1).map(_._2)
    assert(toPartition(streamAssign(frames, 12.0, 2), universe) === expPart,
      "frame-at-a-time")
    assert(toPartition(streamAssign(frames.grouped(6).map(_.flatten).toSeq, 12.0, 2),
      universe) === expPart, "chunked")
    assert(toPartition(streamAssign(Seq(spots), 12.0, 2), universe) === expPart,
      "single batch")
  }

  test("division hand case: first child continues, second starts fresh") {
    val spots = Seq(
      SpotPos(1L, 0L, 10L, 50.0, 50.0),
      SpotPos(1L, 1L, 21L, 48.0, 50.0), SpotPos(1L, 1L, 22L, 53.0, 50.0),
      SpotPos(1L, 2L, 31L, 47.0, 50.0), SpotPos(1L, 2L, 32L, 54.0, 50.0))
    val got = streamAssign(spots.groupBy(_.frame).toSeq.sortBy(_._1).map(_._2), 10.0, 1)
    assert(got(10L) == got(21L) && got(21L) == got(31L))
    assert(got(22L) == got(32L) && got(22L) != got(10L))
  }
}
