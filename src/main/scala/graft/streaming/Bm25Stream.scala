package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.text.Bm25Index

/** STREAMING BM25-index maintenance — the foreachBatch wrapper 30l3's
  * contract declared: each micro-batch of documents appends its
  * postings + stats part via [[Bm25Index.append]], so the retrieval
  * index tracks the crawl feed and serving ([[Bm25Index.topK]]) stays
  * bit-identical to the direct query over everything ingested. The
  * append touches two stores (postings + meta), so the batch runs
  * under [[ExactlyOnce.ledgered]]'s rollback journal
  * ([[graft.sources.CommitLog]]): a replayed COMPLETED batch is
  * marker-skipped, and a crash mid-apply — between the postings and
  * the meta write included — is rolled back to the exact committed
  * file set before the next batch touches the store (crash-injection
  * pinned in Bm25StreamSpec). Batch doc ids disjoint from indexed
  * ones by the 30l3 contract (re-ingest dedup is 22a's job); periodic
  * [[Bm25Index.compact]] folds the accumulated parts. */
object Bm25Stream {

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
      if (!b.isEmpty) Bm25Index.append(b, col("doc_id"), col("text"), dir)
    }(batch, batchId)
}
