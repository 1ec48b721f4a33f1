package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{MoveEvent, MoveOut, StreamOps}

/** Streaming movement features vs the batch window formulation — on
  * identical in-order input the incremental state recurrence performs
  * the same IEEE operations in the same order, so outputs must be
  * bit-equal, including across micro-batch boundaries (state carries
  * the track between batches). */
class MovementStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batchMovement(events: Seq[MoveEvent]) = {
    val df = events.toDF()
    graft.operators.Movement.features(df, "user_id", col("event_id"), col("ts_s"),
        col("x"), col("y"))
      .select(col("user_id"), col("event_id"), col("dis"), col("trac"),
        col("d2t"), col("vel"))
      .as[MoveOut].collect().toSet
  }

  private def streamMovement(batches: Seq[Seq[MoveEvent]], name: String) = {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[MoveEvent]
    batches.foreach(b => stream.addData(b: _*))
    val q = StreamOps.movementStream(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(60000), "query did not finish") finally q.stop()
    spark.table(name).as[MoveOut].collect().toSet
  }

  /** One micro-batch per element of `batches` — forced by draining the
    * query between addData calls (AvailableNow may coalesce). */
  private def streamMovementIncremental(batches: Seq[Seq[MoveEvent]], name: String) = {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[MoveEvent]
    val q = StreamOps.movementStream(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[MoveOut].collect().toSet
  }

  private val track: Seq[MoveEvent] = Seq(
    MoveEvent(1L, 10L, 0L, 0.0, 0.0), MoveEvent(1L, 11L, 10L, 3.0, 4.0),
    MoveEvent(1L, 12L, 20L, 3.0, 8.0), MoveEvent(1L, 13L, 20L, 6.0, 8.0),
    MoveEvent(2L, 20L, 5L, 1.0, 1.0), MoveEvent(2L, 21L, 6L, 2.0, 2.0))

  test("single batch equals the batch window operator bit-for-bit") {
    assert(streamMovement(Seq(track), "mv_one") == batchMovement(track))
  }

  test("state carries tracks across micro-batches (same result split in 3)") {
    val batches = Seq(track.take(2), track.slice(2, 4), track.drop(4))
    assert(streamMovementIncremental(batches, "mv_split") == batchMovement(track))
  }
}
