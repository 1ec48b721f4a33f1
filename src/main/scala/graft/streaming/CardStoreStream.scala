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
  * The append is one directory, but a replayed batch would double the
  * additive masses (sums, unlike the 21w overwrite layout, are not
  * idempotent), so the batch runs under [[ExactlyOnce.ledgered]]'s
  * journal: completed replays are marker-skipped and a torn append
  * rolls back to the committed file census. Periodic
  * [[CardStore.compact]] folds the parts (card pinned bit-identical,
  * CardStoreSpec). */
object CardStoreStream {

  def maintain(docs: DataFrame, dir: String,
               checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch(maintainBatch(dir) _)
      .start()

  /** The foreachBatch handler (exposed for the spec's replay pins).
    * Parts land under `dir/parts` so the ledger directory never sits
    * inside the parquet table the card reads. */
  def maintainBatch(dir: String)(batch: DataFrame, batchId: Long): Unit =
    ExactlyOnce.ledgered(dir) { (b, _) =>
      if (!b.isEmpty)
        CardStore.append(b, col("doc_id"), col("text"), col("lang"),
          s"$dir/parts")
    }(batch, batchId)
}
