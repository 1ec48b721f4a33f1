package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.text.Bm25Index

/** STREAMING BM25-index maintenance — the foreachBatch wrapper 30l3's
  * contract declared: each micro-batch of documents appends its
  * postings + stats part via [[Bm25Index.append]], so the retrieval
  * index tracks the crawl feed and serving ([[Bm25Index.topK]]) stays
  * bit-identical to the direct query over everything ingested.
  *
  * Replay semantics (r16 — manifest-native, the 31g4 gate shape): the
  * index publishes through the MVCC manifest, so a crash mid-append —
  * between the postings and meta writes included — leaves only
  * unpublished debris no reader resolves and [[Bm25Index.retire]]
  * sweeps; there is no rollback journal to replay. Exactly-once then
  * needs only a replay gate:
  *  - a batch with its commit marker (`_ledger/batch.<id>`, written
  *    after the publish) is SKIPPED;
  *  - a marker-less batch whose id is <= the index's committed max
  *    `src_batch` was PUBLISHED by a run that died between the
  *    CURRENT swap and its marker — the only way the stamped meta row
  *    can be committed — so it is marked and skipped, never
  *    double-appended;
  *  - anything else appends (stamping `src_batch`) and then marks.
  * Batch doc ids disjoint from indexed ones by the 30l3 contract
  * (re-ingest dedup is 22a's job); periodic [[Bm25Index.compact]]
  * folds the accumulated parts. Crash faces pinned in Bm25StreamSpec. */
object Bm25Stream {

  def maintain(docs: DataFrame, dir: String,
               checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch(maintainBatch(dir) _)
      .start()

  /** The foreachBatch handler (exposed for the spec's replay pins). */
  def maintainBatch(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, s"_ledger/batch.$batchId")
    if (fs.exists(marker)) return
    def mark(): Unit = {
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
    }
    if (batch.isEmpty) { mark(); return }
    if (Bm25Index.maxSrcBatch(spark, dir) >= batchId) {
      // published, marker lost: commit the marker and move on
      mark(); return
    }
    Bm25Index.append(batch, col("doc_id"), col("text"), dir,
      srcBatch = batchId)
    mark()
  }
}
