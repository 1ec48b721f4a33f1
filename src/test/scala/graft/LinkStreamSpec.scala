package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.SpotLink
import graft.streaming.{LinkOut, LinkStream, SpotPos}

/** Streaming NN spot linking vs the batch operator: identical edge set
  * (src, dst, gap, dist) whether the video arrives frame-at-a-time,
  * in multi-frame batches, or all at once. */
class LinkStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def streamEdges(batches: Seq[Seq[SpotPos]], maxDist: Double,
                          gap: Int): Set[(Long, Long, Long, Double)] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"link_stream_$n"
    val stream = MemoryStream[SpotPos]
    if (batches.size == 1) {
      stream.addData(batches.head: _*)
      val q = LinkStream.nearestStream(stream.toDS(), maxDist, gap, idleTimeoutMs = 0L)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(60000), "query did not finish") finally q.stop()
    } else {
      val q = LinkStream.nearestStream(stream.toDS(), maxDist, gap, idleTimeoutMs = 0L)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    spark.table(name).as[LinkOut].collect()
      .map(o => (o.src, o.dst, o.gap, o.dist)).toSet
  }

  private def batchEdges(spots: Seq[SpotPos], maxDist: Double,
                         gap: Int): Set[(Long, Long, Long, Double)] =
    SpotLink.nearest(
        spots.map(s => (s.id, s.frame, s.x, s.y)).toDF("id", "frame", "x", "y"),
        col("id"), col("frame"), col("x"), col("y"), maxDist, gap)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4)).toSet

  test("random walks: frame-at-a-time, chunked, and single-batch all equal batch") {
    val rnd = new scala.util.Random(11)
    val spots = for {
      w <- 0 until 20
      f <- 0 until 30
      if rnd.nextDouble() >= 0.2
    } yield SpotPos(1L, f.toLong, (w.toLong * 1000L) + f,
      (w % 5) * 30.0 + f * 0.6 + rnd.nextDouble() * 3.0,
      (w / 5) * 28.0 + rnd.nextDouble() * 3.0)
    val exp = batchEdges(spots, 10.0, 2)
    assert(exp.nonEmpty)
    val frames = spots.groupBy(_.frame).toSeq.sortBy(_._1).map(_._2)
    assert(streamEdges(frames, 10.0, 2) === exp, "frame-at-a-time")
    assert(streamEdges(frames.grouped(7).map(_.flatten).toSeq, 10.0, 2) === exp, "chunked")
    assert(streamEdges(Seq(spots), 10.0, 2) === exp, "single batch")
  }

  test("videos are linked independently") {
    // same layout in two videos; edges must stay within each video
    def vid(v: Long) = Seq(
      SpotPos(v, 0L, v * 100 + 1, 10.0, 10.0),
      SpotPos(v, 1L, v * 100 + 2, 12.0, 10.0))
    val got = streamEdges(Seq(vid(1) ++ vid(2)), 5.0, 1)
    assert(got === Set((101L, 102L, 1L, 2.0), (201L, 202L, 1L, 2.0)))
  }

  test("gap-window state is pruned: a parent beyond the gap cannot link") {
    val spots = Seq(
      SpotPos(1L, 0L, 1L, 10.0, 10.0),
      SpotPos(1L, 3L, 2L, 11.0, 10.0)) // 3 frames later, gap window 2
    assert(streamEdges(spots.map(Seq(_)), 10.0, 2) === Set.empty)
  }
}
