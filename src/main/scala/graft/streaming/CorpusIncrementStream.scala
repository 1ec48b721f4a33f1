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
  * Replay semantics: an increment touches SEVERAL artifact dirs, so
  * it cannot be made atomic by one dynamic overwrite; the batch runs
  * under [[ExactlyOnce.ledgered]]'s rollback journal
  * ([[graft.sources.CommitLog]]). A replayed COMPLETED batch (crash
  * after the work, before the checkpoint commit) is skipped by its
  * commit marker; a crash MID-increment — between any two of the
  * eight artifact writes, or mid-write-job — is rolled back to the
  * journaled pre-batch file census, byte-exactly, before the next
  * batch (or any recover-attached reader) sees the store. The
  * increment path only ever ADDS files (appends + fresh pair/label
  * version dirs — CorpusIncrement's add-only contract), which is what
  * makes undo-by-delete exact. Crash-injection recovery is pinned in
  * CorpusIncrementStreamSpec (serving == the batch rebuild after
  * kill + recover + replay). Batch doc-id monotonicity is the 31g3
  * ordering contract, enforced fail-fast by the increment itself. */
object CorpusIncrementStream {

  def maintain(docs: DataFrame, dir: String,
               checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch(maintainBatch(dir) _)
      .start()

  /** The foreachBatch handler (exposed for the spec's replay pins). */
  def maintainBatch(dir: String)(batch: DataFrame, batchId: Long): Unit =
    ExactlyOnce.ledgered(dir) { (b, _) =>
      if (!b.isEmpty) { CorpusIncrement.increment(b, dir); () }
    }(batch, batchId)
}
