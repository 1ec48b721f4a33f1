package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-batch source plumbing beyond files — the Kafka stand-in (no
  * connector jars ship in this container; a real deployment swaps the
  * `format` for `kafka` and maps key/value/timestamp instead).
  *
  * Spark's built-in `rate-micro-batch` source is the right stand-in
  * because it behaves like a partitioned log: deterministic rows per
  * batch, monotonically increasing offsets (`value`), replayable from
  * any checkpoint — so the exactly-once/offset semantics a Kafka
  * pipeline relies on are exercised for real, not mocked.
  *
  * [[eventColumns]] maps the source's offset into the events schema
  * with event time DERIVED FROM THE OFFSET, not the source's
  * wall-clock timestamp: the stream over offsets [0, n) is then
  * bit-identical to the batch frame over `spark.range(n)`, giving the
  * same stream-equals-batch oracle contract every other StreamOps
  * spec pins (and making replays deterministic — wall-clock event
  * time would change on every run).
  */
object RateSource {

  val EventTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error")

  /** Pure column mapping offset -> events row; applies unchanged to the
    * streaming source and to `spark.range(n)` (the batch oracle). */
  def eventColumns(src: DataFrame, offset: org.apache.spark.sql.Column): DataFrame =
    src.select(
      offset.as("event_id"),
      timestamp_seconds(lit(1700000000L) + offset * 60L).as("ts"),
      (offset % 100L).as("user_id"),
      element_at(array(EventTypes.map(lit): _*), (offset % 5L + 1L).cast("int"))
        .as("event_type"),
      (offset % 997L).cast("double").as("value"))

  /** The streaming events source: `rowsPerBatch` rows per micro-batch,
    * offsets continuing across batches (and across restarts from a
    * checkpoint). */
  def events(spark: SparkSession, rowsPerBatch: Int): DataFrame =
    eventColumns(
      spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rowsPerBatch)
        .load(),
      col("value"))

  /** The batch oracle for the first `n` offsets of [[events]]. */
  def eventsBatch(spark: SparkSession, n: Long): DataFrame =
    eventColumns(spark.range(n).toDF("value"), col("value"))
}
