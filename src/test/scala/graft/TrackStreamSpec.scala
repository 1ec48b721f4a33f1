package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.operators.TrackAssignment
import graft.streaming.{SpotArrival, TrackSpotOut, TrackStream}

/** Streaming division-aware track assignment vs the batch operator.
  * Compared as PARTITIONS (which spots share a track): the stream
  * labels tracks by head spot id (the only label an append stream can
  * emit), the batch operator by min id per segment — the induced
  * partition must be identical, frame-at-a-time or all-at-once. */
class TrackStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Spot arrivals (spot + all in-edges) from a (frames, edges) graph. */
  private def arrivals(frames: Map[Long, Long],
                       edges: Seq[(Long, Long)]): Seq[SpotArrival] = {
    val byDst = edges.groupBy(_._2)
    frames.toSeq.sortBy(_._2).map { case (id, frame) =>
      val ps = byDst.getOrElse(id, Nil).map(_._1).toArray
      SpotArrival(1L, frame, id, ps, ps.map(frames))
    }
  }

  private def streamPartition(batches: Seq[Seq[SpotArrival]], name: String,
                              horizon: Long = Long.MaxValue): Map[Long, Long] = {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[SpotArrival]
    val q = TrackStream.divisionAwareStream(stream.toDS(), horizon, idleTimeoutMs = 0L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow())
    if (batches.size == 1) {
      stream.addData(batches.head: _*)
      val run = q.start()
      try assert(run.awaitTermination(60000), "query did not finish") finally run.stop()
    } else {
      val run = TrackStream.divisionAwareStream(stream.toDS(), horizon, idleTimeoutMs = 0L)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => stream.addData(b: _*); run.processAllAvailable() }
      finally run.stop()
    }
    spark.table(name).as[TrackSpotOut].collect().map(o => o.id -> o.track_id).toMap
  }

  private def batchPartition(frames: Map[Long, Long],
                             edges: Seq[(Long, Long)]): Set[Set[Long]] = {
    val spots = frames.toSeq.toDF("id", "frame")
    TrackAssignment.divisionAware(spots, edges.toDF("src", "dst"))
      .as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
  }

  private def toPartition(assign: Map[Long, Long], universe: Set[Long]): Set[Set[Long]] =
    assign.filter(kv => universe(kv._1))
      .groupBy(_._2).values.map(_.keySet).toSet

  /** Frame-at-a-time and single-batch runs both match the batch operator. */
  private def check(frames: Map[Long, Long], edges: Seq[(Long, Long)], tag: String): Unit = {
    val universe = (edges.map(_._1) ++ edges.map(_._2)).toSet
    val exp = batchPartition(frames, edges)
    val arr = arrivals(frames, edges)
    val perFrame = arr.groupBy(_.frame).toSeq.sortBy(_._1).map(_._2)
    assert(toPartition(streamPartition(Seq(arr), s"ts_one_$tag"), universe) == exp,
      "single micro-batch diverged from batch operator")
    assert(toPartition(streamPartition(perFrame, s"ts_inc_$tag"), universe) == exp,
      "frame-at-a-time run diverged from batch operator")
  }

  // 1(f1)->2(f2) divides into 3(f3, continues) and 4(f3, new track);
  // 4->5(f4); 3 and 5 merge into 6(f5): 6 chooses the later parent 5,
  // so 3's track ends at the merge; 7(f2)->8(f6) is a gap-closing
  // track; 9(f3) is an isolated spot (dropped by the batch universe).
  private val mergeFrames = Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L,
    5L -> 4L, 6L -> 5L, 7L -> 2L, 8L -> 6L, 9L -> 3L)
  private val mergeEdges = Seq((1L, 2L), (2L, 3L), (2L, 4L), (4L, 5L),
    (3L, 6L), (5L, 6L), (7L, 8L))

  test("division + merge + frame gap matches the batch partition") {
    check(mergeFrames, mergeEdges, "merge")
  }

  test("heap lineage forest matches the batch partition") {
    // heap forest: node rn divides into 2rn/2rn+1 (Ingest.lineageForest
    // shape) for three videos' worth of ids, plus one plain chain
    val frames = scala.collection.mutable.Map[Long, Long]()
    val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (base <- Seq(100L, 200L); n <- Seq(11L)) {
      (1L to n).foreach { rn =>
        // frame = heap depth, so sibling subtrees overlap in time
        frames(base + rn) = 63 - java.lang.Long.numberOfLeadingZeros(rn)
        if (rn * 2 <= n) edges += ((base + rn, base + rn * 2))
        if (rn * 2 + 1 <= n) edges += ((base + rn, base + rn * 2 + 1))
      }
    }
    (1L to 5L).foreach { i =>
      frames(300L + i) = i
      if (i > 1) edges += ((300L + i - 1, 300L + i))
    }
    check(frames.toMap, edges.toSeq, "heap")
  }

  test("isolated spots get their own single-spot track in the stream") {
    val assign = streamPartition(Seq(arrivals(mergeFrames, mergeEdges)), "ts_iso")
    assert(assign(9L) == 9L)
    assert(assign.keySet == mergeFrames.keySet)
  }

  test("horizon pruning cuts a continuation past the gap limit") {
    // 7(f2)->8(f6): gap of 4 frames; horizon 2 drops 7's tail before 8
    // arrives, so 8 heads a fresh track instead of continuing 7's
    val arr = arrivals(mergeFrames, mergeEdges)
    val perFrame = arr.groupBy(_.frame).toSeq.sortBy(_._1).map(_._2)
    val unbounded = streamPartition(perFrame, "ts_hz_off")
    val pruned = streamPartition(perFrame, "ts_hz_on", horizon = 2L)
    assert(unbounded(8L) == unbounded(7L), "sanity: unbounded continues the gap")
    assert(pruned(8L) == 8L && pruned(7L) == 7L)
    assert((pruned - 8L) == (unbounded - 8L), "pruning must only affect the gapped spot")
  }
}
