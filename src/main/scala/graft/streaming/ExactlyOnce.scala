package graft.streaming

import org.apache.spark.sql.DataFrame

/** Replay-safe streaming output — the foreachBatch half of Structured
  * Streaming's exactly-once story: the checkpoint gives at-least-once
  * batch delivery, so the sink must be IDEMPOTENT per (batch, data).
  * The standard pattern is partition-by-batch-id + dynamic partition
  * overwrite: a replayed micro-batch overwrites exactly its own
  * partition, never appending duplicates and never touching other
  * batches' output. At scale this is also the layout you want — each
  * micro-batch is one self-contained partition directory, compactable
  * later (sources.Compaction).
  */
object ExactlyOnce {

  /** The foreachBatch handler: write `batch` under `path` partitioned
    * by batch_id, overwriting only the partitions present in this
    * batch (dynamic mode). Safe to call twice with the same
    * (batch, batchId) — the second call replaces the first's files.
    * The overwrite mode is set per-WRITER (the DataFrameWriter option
    * takes precedence over the session conf), so concurrent sinks on
    * one SparkSession can never race a session-global flag into
    * 'static' — which would turn a replay into a full-path overwrite. */
  def writeBatch(path: String)(batch: DataFrame, batchId: Long): Unit = {
    batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(path)
  }

}
