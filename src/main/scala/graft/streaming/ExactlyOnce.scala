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

  /** Replay gate for MULTI-write stores that one dynamic overwrite
    * cannot make idempotent (the BM25 index's postings + meta, the
    * corpus-artifact set): a batch LEDGER — a marker file per applied
    * micro-batch id under `storeDir/_ledger`, written only after
    * `apply` completes, checked before applying — so a replayed
    * COMPLETED batch (crash after the work, before the checkpoint
    * commit: the common at-least-once case) is skipped rather than
    * double-appended. Weaker than [[writeBatch]] and declared as
    * such: a crash MID-apply leaves a torn store the ledger cannot
    * repair (recovery = restore from the last compaction snapshot and
    * replay; a Delta-style commit log is the production upgrade). */
  def ledgered(storeDir: String)(apply: (DataFrame, Long) => Unit)
              (batch: DataFrame, batchId: Long): Unit = {
    val ledger = new org.apache.hadoop.fs.Path(s"$storeDir/_ledger/$batchId")
    val fs = ledger.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(ledger)) return
    apply(batch, batchId)
    fs.mkdirs(ledger.getParent)
    fs.create(ledger, true).close()
    ()
  }
}
