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

  /** Exactly-once gate for MULTI-write stores that one dynamic
    * overwrite cannot make idempotent (the BM25 index's postings +
    * meta, the corpus-artifact set), on the batch-grain rollback
    * journal ([[graft.sources.CommitLog]]): a replayed COMPLETED batch
    * is skipped by its commit marker (the original ledger contract),
    * and a crash MID-apply — between the postings and meta writes,
    * between artifact directories, or mid-write-job — is ROLLED BACK
    * from the journaled pre-state census before the next batch (or any
    * recover-attached reader) touches the store, so readers resolve
    * only committed file sets. `apply`'s writes must only ADD files
    * (the stores' append/versioned-dir contract); crash-injection
    * recovery is spec-pinned per store (Bm25StreamSpec,
    * CorpusIncrementStreamSpec). */
  def ledgered(storeDir: String)(apply: (DataFrame, Long) => Unit)
              (batch: DataFrame, batchId: Long): Unit =
    graft.sources.CommitLog.atomically(batch.sparkSession, storeDir,
      batchId) { apply(batch, batchId) }
}
