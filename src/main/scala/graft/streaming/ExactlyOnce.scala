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
    * (batch, batchId) — the second call replaces the first's files. */
  def writeBatch(path: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id").parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
