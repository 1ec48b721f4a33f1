package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.text.CardStore

/** STREAMING dataset-card maintenance — 30t3's card store driven by an
  * unbounded ingest feed: each micro-batch appends its one part row
  * ([[CardStore.append]] — additive masses + the HLL and bottom-k
  * sketches), so the release card ([[CardStore.card]]) is continuously
  * current from parts-grain reads while the corpus itself is never
  * rescanned. Contrast 30t2 (CardStream), which emits per-WINDOW cards
  * of the flowing data; this member maintains the CUMULATIVE release
  * card as a persisted artifact.
  *
  * Replay semantics (r16 — manifest-native, the 31g4 gate shape): the
  * card store publishes through the MVCC manifest, so a crash mid-
  * append leaves only unpublished debris no reader resolves and
  * [[CardStore.retire]] sweeps — no rollback journal. Exactly-once
  * (additive sums are NOT replay-idempotent) then needs only:
  *  - a batch with its commit marker (`_ledger/batch.<id>`, written
  *    after the publish) is SKIPPED;
  *  - a marker-less batch whose id is <= the store's committed max
  *    `src_batch` was PUBLISHED by a run that died between the
  *    CURRENT swap and its marker — the only way the stamped part can
  *    be committed — so it is marked and skipped, never double-summed;
  *  - anything else appends (stamping `src_batch`) and then marks.
  * Batch-id monotonicity is the streaming checkpoint's contract. */
object CardStoreStream {

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
    if (CardStore.maxSrcBatch(spark, dir) >= batchId) {
      // published, marker lost: commit the marker and move on
      mark(); return
    }
    CardStore.append(batch, col("doc_id"), col("text"), col("lang"),
      dir, srcBatch = batchId)
    mark()
  }
}
