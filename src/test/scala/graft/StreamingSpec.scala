package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts equal the batch run on the same data") {
    implicit val sql = spark.sqlContext
    val data = Seq(
      (Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.5),
      (Timestamp.valueOf("2024-01-01 00:40:00"), "click", 2.5),
      (Timestamp.valueOf("2024-01-01 01:10:00"), "click", 3.0),
      (Timestamp.valueOf("2024-01-01 00:20:00"), "view", 1.0))
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(data)
    val sdf = stream.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedCounts(sdf, "1 hour", watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("win_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("win_out")
      .select("win_start_s", "event_type", "n", "v_sum")
      .as[(Long, String, Long, Double)].collect().toSet
    val exp = StreamOps.windowedCounts(data.toDF("ts", "event_type", "value"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == exp)
    assert(got.size == 3) // (h0 click x2), (h1 click), (h0 view)
  }

  test("streaming windowed HLL distinct equals the batch run; repeats collapse") {
    implicit val sql = spark.sqlContext
    // user 7 appears twice in hour 0 (distinct must collapse it, a
    // plain count would say 3); user 8 spans both hours (counted in
    // each window independently)
    val data = Seq(
      (Timestamp.valueOf("2024-01-01 00:10:00"), "click", 7L),
      (Timestamp.valueOf("2024-01-01 00:40:00"), "click", 7L),
      (Timestamp.valueOf("2024-01-01 00:50:00"), "click", 8L),
      (Timestamp.valueOf("2024-01-01 01:10:00"), "click", 8L),
      (Timestamp.valueOf("2024-01-01 00:20:00"), "view", 9L))
    val stream = MemoryStream[(Timestamp, String, Long)]
    val sdf = stream.toDF().toDF("ts", "event_type", "user_id")
    val q = StreamOps.windowedDistinct(sdf, "1 hour", watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("dist_out")
      .outputMode("complete").start()
    // GENUINE micro-batches: each addData is drained before the next,
    // so the cross-batch partial-sketch merge is what's exercised
    try data.grouped(2).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dist_out")
      .as[(Long, String, Long)].collect().toSet
    val exp = StreamOps.windowedDistinct(
        data.toDF("ts", "event_type", "user_id"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == exp)
    // at this cardinality the sketch is exact: 2 distinct in h0-click
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(got.contains((h0, "click", 2L)))
    assert(got.contains((h0, "view", 1L)))
  }
}
