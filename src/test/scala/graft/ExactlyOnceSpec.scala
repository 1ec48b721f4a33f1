package graft

import graft.streaming.ExactlyOnce
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class ExactlyOnceSpec extends SparkSpec {
  import spark.implicits._

  test("a replayed micro-batch overwrites its own partition, not appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_eo").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    ExactlyOnce.writeBatch(dir)(b0, 0L)
    ExactlyOnce.writeBatch(dir)(b1, 1L)
    // retry of batch 0 (at-least-once delivery) — must be a no-op net
    ExactlyOnce.writeBatch(dir)(b0, 0L)
    val got = spark.read.parquet(dir)
      .select("batch_id", "id", "v").as[(Long, Long, String)].collect().toSet
    assert(got == Set((0L, 1L, "a"), (0L, 2L, "b"), (1L, 3L, "c")),
      "no duplicates after replay, other batches untouched")
  }

  test("a recomputed (different) replay replaces the bad attempt entirely") {
    val dir = java.nio.file.Files.createTempDirectory("graft_eo2").toString
    ExactlyOnce.writeBatch(dir)(Seq((1L, "stale")).toDF("id", "v"), 5L)
    ExactlyOnce.writeBatch(dir)(Seq((1L, "fresh"), (2L, "new")).toDF("id", "v"), 5L)
    val got = spark.read.parquet(dir)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "fresh"), (2L, "new")))
  }

  test("wired into a real stream via foreachBatch") {
    implicit val sql = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    stream.addData(1L, 2L, 3L)
    val dir = java.nio.file.Files.createTempDirectory("graft_eo3").toString
    val q = stream.toDF().toDF("id")
      .writeStream.foreachBatch(ExactlyOnce.writeBatch(dir) _)
      .trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(60000)) finally q.stop()
    val got = spark.read.parquet(dir).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }
}
