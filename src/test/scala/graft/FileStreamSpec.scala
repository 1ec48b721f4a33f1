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
    // same ns->µs conversion the batch loader applies
    val stream = streamRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
}
