package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Interaction
import graft.streaming.{IaOut, IaSpot, InteractionStream}

/** Streaming track-interaction detection vs the batch operator: the
  * stream's LAST emission per pair must equal Interaction.pairs over
  * the same spots EXACTLY — the accumulators are decimal-quantized
  * (order-independent), so parity is bit-level, not approximate. */
class InteractionStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def streamPairs(batches: Seq[Seq[IaSpot]], maxDist: Double,
                          minShared: Int): Map[(Long, Long, Long), IaOut] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"iastream_$n"
    val stream = MemoryStream[IaSpot]
    if (batches.size == 1) {
      stream.addData(batches.head: _*)
      val q = InteractionStream.pairsStream(stream.toDS(), maxDist, minShared)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(60000), "query did not finish")
      finally q.stop()
    } else {
      val q = InteractionStream.pairsStream(stream.toDS(), maxDist, minShared)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    // update-mode changelog: the LAST row per pair is its final score.
    // The memory sink appends every update; take the max-n_shared row
    // (n_shared only grows, so it identifies the latest emission).
    spark.table(name).as[IaOut].collect()
      .groupBy(o => (o.video, o.u1, o.u2))
      .view.mapValues(_.maxBy(_.n_shared)).toMap
  }

  private def batchPairs(spots: Seq[IaSpot], maxDist: Double,
                         minShared: Int): Map[(Long, Long, Long), (Long, Double, Double)] =
    spots.groupBy(_.video).toSeq.flatMap { case (v, sp) =>
      Interaction.pairs(
          sp.map(s => (s.t, s.f, s.x, s.y)).toDF("t", "f", "x", "y"),
          col("t"), col("f"), col("x"), col("y"), maxDist, minShared)
        .as[(Long, Long, Long, Double, Double)].collect()
        .map { case (u1, u2, ns, md, dc) => (v, u1, u2) -> ((ns, md, dc)) }
    }.toMap

  private def check(spots: Seq[IaSpot], batches: Seq[Seq[IaSpot]],
                    maxDist: Double, minShared: Int, tag: String): Unit = {
    val want = batchPairs(spots, maxDist, minShared)
    val got = streamPairs(batches, maxDist, minShared)
    assert(got.keySet === want.keySet, s"$tag: pair sets differ")
    want.foreach { case (k, (ns, md, dc)) =>
      val o = got(k)
      assert(o.n_shared === ns, s"$tag $k n_shared")
      assert(o.min_dist === md, s"$tag $k min_dist")
      assert(o.dir_corr === dc, s"$tag $k dir_corr")
    }
  }

  test("random walks: stream == batch exactly, frame-at-a-time, chunked, single batch") {
    val rnd = new scala.util.Random(17)
    // 12 tracks in 2 videos on drifting lattice walks — near pairs,
    // co-migration, and dropout gaps all occur
    val spots = for {
      v <- 1L to 2L
      w <- 0 until 6
      f <- 0 until 18
      if rnd.nextDouble() >= 0.2
    } yield IaSpot(v, v * 100L + w,  f.toLong,
      (w % 3) * 2.5 + f * 0.4 + rnd.nextDouble() * 2.0,
      (w / 3) * 2.0 + v * 50.0 + rnd.nextDouble() * 2.0)
    val frames = spots.groupBy(_.f).toSeq.sortBy(_._1).map(_._2)
    check(spots, frames, 3.0, 3, "frame-at-a-time")
    check(spots, frames.grouped(5).map(_.flatten).toSeq, 3.0, 3, "chunked")
    check(spots, Seq(spots), 3.0, 3, "single batch")
  }

  test("late proximity backfills the full shared history, as in batch phase 2") {
    // A and B co-migrate in lockstep from frame 0 but sit 20 apart;
    // at frame 8 B jumps next to A. The batch operator scores the
    // WHOLE shared series of the candidate pair, so the stream must
    // backfill frames 1-8 at the moment the pair first turns near.
    val a = (0 to 9).map(f => IaSpot(1L, 1L, f.toLong, f * 1.0, 0.0))
    val b = (0 to 7).map(f => IaSpot(1L, 2L, f.toLong, f * 1.0, 20.0)) :+
      IaSpot(1L, 2L, 8L, 8.0, 1.0) :+ IaSpot(1L, 2L, 9L, 9.0, 1.0)
    val spots = a ++ b
    val frames = spots.groupBy(_.f).toSeq.sortBy(_._1).map(_._2)
    val got = streamPairs(frames, 3.0, 3)
    val want = batchPairs(spots, 3.0, 3)
    assert(want.contains((1L, 1L, 2L)), "batch must score the pair")
    assert(got.keySet === want.keySet)
    val (ns, md, dc) = want((1L, 1L, 2L))
    assert(got((1L, 1L, 2L)).n_shared === ns)
    assert(got((1L, 1L, 2L)).min_dist === md)
    assert(got((1L, 1L, 2L)).dir_corr === dc)
    // the full shared series was scored: 9 shared step frames (a
    // stream that only counted from the first near frame would see 2);
    // the lockstep segments keep the correlation positive even though
    // B's frame-8 jump step dominates its norm
    assert(ns === 9L && dc > 0.0)
  }

  test("videos are isolated: identical geometry in another video never pairs") {
    val mk = (v: Long) => (0 to 6).flatMap(f => Seq(
      IaSpot(v, v * 10L + 1L, f.toLong, f * 1.0, 0.0),
      IaSpot(v, v * 10L + 2L, f.toLong, f * 1.0, 1.0)))
    val spots = mk(1L) ++ mk(2L)
    val got = streamPairs(spots.groupBy(_.f).toSeq.sortBy(_._1).map(_._2), 3.0, 3)
    assert(got.keySet === Set((1L, 11L, 12L), (2L, 21L, 22L)),
      s"got ${got.keySet}")
  }

  test("degenerate-dense cell fail-fasts, as in the batch contract") {
    val spots = (0 until 40).map(i => IaSpot(1L, i.toLong, 0L, 0.1, 0.1))
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[IaSpot]
    stream.addData(spots: _*)
    val q = InteractionStream.pairsStream(stream.toDS(), 5.0, 1,
        maxCellOccupancy = 8)
      .writeStream.format("memory").queryName("iastream_ff")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("maxCellOccupancy")), s"$e")
  }
}
