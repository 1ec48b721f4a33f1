package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamOps

/** Streaming over the real parquet events via the file source: the
  * batch run of the same pipeline is the correctness oracle. */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("file-source streaming windowed counts equal the batch run") {
    val batchEvents = Tables.events(spark, sfDir)
    val schema = Tables.load(spark, sfDir, "events").schema
    // the file source streams a DIRECTORY; stage the single parquet there
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val streamRaw = spark.readStream.schema(schema).parquet(dir.toString)
    // same ts normalization the batch loader applies
    val stream = Tables.normalizeTs(streamRaw)
    val q = StreamOps.windowedCounts(stream, "1 hour", watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("fs_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000), "stream did not finish") finally q.stop()
    val got = spark.table("fs_out")
      .as[(Long, String, Long, Double)].collect().toSet
    val exp = StreamOps.windowedCounts(batchEvents)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("streaming dedup drops repeated keys within the watermark") {
    import java.sql.Timestamp
    implicit val sql = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Long)]
    stream.addData(
      (Timestamp.valueOf("2024-01-01 00:00:01"), 1L),
      (Timestamp.valueOf("2024-01-01 00:00:02"), 1L), // dup key
      (Timestamp.valueOf("2024-01-01 00:00:03"), 2L))
    val q = StreamOps.dedupStream(stream.toDF().toDF("ts", "k"), Seq("k"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(60000)) finally q.stop()
    val keys = spark.table("dedup_out").select("k").as[Long].collect().sorted
    assert(keys.toSeq == Seq(1L, 2L))
  }

  test("stream-static enrichment joins a broadcast dimension per batch") {
    val schema = Tables.load(spark, sfDir, "events").schema
    val dir = java.nio.file.Files.createTempDirectory("graft_enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0),
      ("signup", 3.0), ("error", 0.0)).toDF("event_type", "weight")
    val q = StreamOps.enrich(stream, dim, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("weight")).as("w"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    val got = spark.table("enrich_out").as[(String, Long, Double)].collect()
      .map { case (k, n, w) => k -> ((n, w)) }.toMap
    val expN = Tables.events(spark, sfDir).groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(got.view.mapValues(_._1).toMap == expN)
    assert(got("purchase")._2 == 5.0)
  }
}
