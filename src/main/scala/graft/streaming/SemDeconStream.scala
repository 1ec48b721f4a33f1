package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.vector.SemDecontaminate

/** One timestamped embedding arrival for streaming decontamination. */
case class VecAt(ts: Timestamp, vec_id: Long, embedding: Seq[Float])

/** STREAMING semantic test-set decontamination — the live-ingest
  * surface of [[graft.vector.SemDecontaminate]]: corpus vectors
  * arrive as a stream and each is flagged against the benchmark
  * embedding suite as it passes. The batch kernel is already the
  * right streaming shape — the eval suite is benchmark-sized, so it
  * collects ONCE before the stream starts and rides into every
  * micro-batch inside the same codegen'd broadcast-matrix kernel
  * ([[graft.functions.ArgmaxCosine]]); the operator is MAP-ONLY with
  * zero state, so watermarks, late data and retention simply do not
  * arise — every arrival emits exactly one output row, and streamed
  * rows are row-for-row identical to the batch operator on the same
  * data (the spec's parity pin). This is the decontamination gate a
  * crawl front runs BEFORE documents accumulate into the store,
  * rather than auditing the store after the fact. */
object SemDeconStream {

  /** Flag each arriving vector against `eval` (static benchmark
    * table: eval_id, embedding) at `threshold`. Append-mode output:
    * (vec_id, eval_id, sim, flagged) — the batch contract, per
    * arrival. */
  def flagged(stream: Dataset[VecAt], eval: DataFrame,
              threshold: Double): DataFrame =
    SemDecontaminate.flag(
      stream.toDF(), col("vec_id"), col("embedding"),
      eval, col("eval_id"), col("embedding"), threshold)
}
