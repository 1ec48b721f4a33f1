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

  test("session conf is never touched: replay stays partition-scoped even with the session set to static") {
    val dir = java.nio.file.Files.createTempDirectory("graft_eo4").toString
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try {
      ExactlyOnce.writeBatch(dir)(Seq((1L, "a")).toDF("id", "v"), 0L)
      ExactlyOnce.writeBatch(dir)(Seq((2L, "b")).toDF("id", "v"), 1L)
      // replay of batch 0 with the session conf in the dangerous mode:
      // the per-writer option must still confine the overwrite
      ExactlyOnce.writeBatch(dir)(Seq((1L, "a")).toDF("id", "v"), 0L)
      assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static",
        "writeBatch must not mutate the session conf")
      val got = spark.read.parquet(dir)
        .select("batch_id", "id", "v").as[(Long, Long, String)].collect().toSet
      assert(got == Set((0L, 1L, "a"), (1L, 2L, "b")),
        "batch 1's partition survives a batch-0 replay under a static session conf")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("two concurrent sinks on one session replay without clobbering each other") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_eoA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_eoB").toString
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future {
      (0 until 4).foreach { i =>
        ExactlyOnce.writeBatch(dirA)(Seq((i.toLong, "a")).toDF("id", "v"), i.toLong)
        // immediate replay of the same batch (at-least-once delivery)
        ExactlyOnce.writeBatch(dirA)(Seq((i.toLong, "a")).toDF("id", "v"), i.toLong)
      }
    }
    val fb = Future {
      (0 until 4).foreach { i =>
        ExactlyOnce.writeBatch(dirB)(Seq((i.toLong, "b")).toDF("id", "v"), i.toLong)
        ExactlyOnce.writeBatch(dirB)(Seq((i.toLong, "b")).toDF("id", "v"), i.toLong)
      }
    }
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
    val a = spark.read.parquet(dirA).select("id", "v").as[(Long, String)].collect().toSet
    val b = spark.read.parquet(dirB).select("id", "v").as[(Long, String)].collect().toSet
    assert(a == (0 until 4).map(i => (i.toLong, "a")).toSet,
      "sink A: every batch present exactly once after interleaved replays")
    assert(b == (0 until 4).map(i => (i.toLong, "b")).toSet,
      "sink B: every batch present exactly once after interleaved replays")
  }

  test("the per-batch layout compacts: many micro-batch files -> few, data intact") {
    // the sink's partition-by-batch_id output IS the small-files shape
    // sources.Compaction exists for — pin the claimed composition
    val dir = java.nio.file.Files.createTempDirectory("graft_eoc").toString
    (0 until 8).foreach { i =>
      ExactlyOnce.writeBatch(dir)(
        Seq((i.toLong * 10, s"v$i")).toDF("id", "v").repartition(4), i.toLong)
    }
    def parquetFiles(p: String): Int = {
      val fs = new java.io.File(p)
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(fs)
    }
    val before = parquetFiles(dir)
    assert(before >= 8, s"micro-batches left many files, got $before")
    val compacted = java.nio.file.Files.createTempDirectory("graft_eoc2").toString
    graft.sources.Compaction.compact(
      spark.read.parquet(dir), compacted, targetFiles = 1)
    assert(parquetFiles(compacted) === 1)
    val got = graft.sources.Compaction.read(spark, compacted)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got === (0 until 8).map(i => (i.toLong * 10, s"v$i")).toSet)
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
