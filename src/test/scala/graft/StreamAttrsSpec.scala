package graft

import graft.text.TextFeatures
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The fused attribute pass is map-only, so it applies to an unbounded
  * stream unchanged — the tagging half of the streaming corpus filter
  * (CorpusStream covers the gates; this pins the attributes surface).
  * The batch run over the same files is the correctness oracle. */
class StreamAttrsSpec extends SparkSpec {

  test("streaming attributes equal the batch pass on the same files") {
    val docs = Tables.documents(spark, sfDir)
    val schema = docs.schema
    val dir = java.nio.file.Files.createTempDirectory("graft_attrs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val lined = regexp_replace(
      regexp_replace(col("text"), "\\s+", " "), "(\\S+ \\S+) ", "$1\n")
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = TextFeatures.attributes(stream, col("doc_id"), col("text"), lined)
      .writeStream.format("memory").queryName("attrs_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000), "stream did not finish") finally q.stop()
    val got = spark.table("attrs_out").collect().map(_.toSeq).toSet
    val exp = TextFeatures.attributes(docs, col("doc_id"), col("text"), lined)
      .collect().map(_.toSeq).toSet
    assert(got == exp)
    assert(got.nonEmpty)
  }
}
