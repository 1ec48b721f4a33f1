package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.text.CorpusIncrement

/** STREAMING corpus-artifact maintenance — the 31g3 incremental build
  * driven by an unbounded crawl feed: each micro-batch of documents
  * folds into the persisted artifact store via
  * [[CorpusIncrement.increment]], so the corpus sample
  * ([[CorpusIncrement.assemble]]) is continuously maintainable without
  * ever re-scanning the base. The 31i streaming corpus filter runs the
  * per-document stages on a stream but cannot retract (near-dup
  * clustering and df-band evidence are corpus-global); this operator
  * completes the story by maintaining the GLOBAL stages' artifacts
  * between batches.
  *
  * Replay semantics (r15 — manifest-native): an increment publishes
  * ONE manifest generation across all eight artifact dirs, so the
  * store needs no rollback journal — a crash between ANY two artifact
  * writes (or mid-write-job) leaves only unpublished debris that no
  * reader resolves and [[CorpusIncrement.compact]]'s retirement
  * sweeps; the next attempt re-runs against the prior generation with
  * no recovery step. Exactly-once then needs only a replay gate:
  *  - a batch with its commit marker (`_ledger/batch.<id>`, written
  *    after the publish) is SKIPPED;
  *  - a marker-less batch whose ids are all <= the store's committed
  *    max doc id was PUBLISHED by a run that died between the CURRENT
  *    swap and its marker — the only way the manifest-resolved meta
  *    can reflect the batch — so it is marked and skipped, never
  *    double-applied (the increment's own monotonic-ids fail-fast
  *    would refuse it anyway, but a refusal would wedge the stream);
  *  - anything else applies and then marks.
  * Batch doc-id monotonicity is the 31g3 ordering contract, enforced
  * fail-fast by the increment itself. Crash faces are pinned in
  * CorpusIncrementStreamSpec (mid-increment debris invisible; lost
  * marker skipped; replayed completed batch a no-op). */
object CorpusIncrementStream {

  def maintain(docs: DataFrame, dir: String,
               checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch(maintainBatch(dir) _)
      .start()

  private def markerPath(dir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(dir, s"_ledger/batch.$batchId")

  /** The foreachBatch handler (exposed for the spec's replay pins). */
  def maintainBatch(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val marker = markerPath(dir, batchId)
    if (fs.exists(marker)) return
    def mark(): Unit = { fs.create(marker, true).close() }
    if (batch.isEmpty) { mark(); return }
    val bMax = batch.agg(
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("doc_id"))).head().getLong(0)
    if (bMax <= CorpusIncrement.maxDocId(spark, dir)) {
      // published, marker lost: commit the marker and move on. The
      // gate cannot distinguish that face from a contract-violating
      // out-of-order batch (ids all <= committed max) that was NEVER
      // applied — which this path would silently discard — so make the
      // decision observable for operators auditing the feed's
      // monotonicity contract.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"corpus-increment replay gate: batch $batchId (max doc_id " +
          s"$bMax <= committed max) marked as already-published at $dir" +
          " — if this batch was out-of-order rather than a lost marker," +
          " its rows are dropped by the 31g3 monotonic-ids contract")
      mark(); return
    }
    CorpusIncrement.increment(batch, dir)
    mark()
  }
}
