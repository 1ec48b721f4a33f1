package graft

import org.apache.spark.sql.functions._
import graft.streaming.RateSource

/** Non-file micro-batch source plumbing: the rate-micro-batch source
  * (Kafka stand-in — deterministic rows per batch, monotonic offsets)
  * feeding the same column pipelines, with the offset-derived batch
  * frame as the oracle. */
class RateSourceSpec extends SparkSpec {
  import spark.implicits._

  private def waitForRows(table: String, n: Long, timeoutMs: Long = 90000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.table(table).count() < n && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    assert(spark.table(table).count() >= n, s"$table never reached $n rows")
  }

  test("multi-batch offsets reproduce the batch frame bit-for-bit") {
    val q = RateSource.events(spark, rowsPerBatch = 500)
      .writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    try waitForRows("rate_out", 1000) finally q.stop()
    // at least two micro-batches arrived; their union must equal the
    // batch mapping of the same offsets exactly (schema and values)
    val got = spark.table("rate_out").filter(col("event_id") < 1000)
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect().toSet
    val exp = RateSource.eventsBatch(spark, 1000)
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect().toSet
    assert(got == exp)
    assert(got.size == 1000)
  }

  test("stream-static broadcast enrichment rides the non-file source") {
    val dim = RateSource.EventTypes.map(t => (t, t.length)).toDF("event_type", "w")
    val q = graft.streaming.StreamOps.enrich(RateSource.events(spark, 500), dim, "event_type")
      .writeStream.format("memory").queryName("rate_enrich_out")
      .outputMode("append").start()
    try waitForRows("rate_enrich_out", 500) finally q.stop()
    val bad = spark.table("rate_enrich_out")
      .filter(col("w") =!= length(col("event_type"))).count()
    assert(bad == 0)
  }
}
