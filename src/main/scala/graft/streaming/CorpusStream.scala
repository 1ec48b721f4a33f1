package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.text.TextFeatures

/** One timestamped document arrival for the streaming corpus filter. */
case class DocAt(ts: Timestamp, doc_id: Long, text: String,
                 lang: String, source: String)

/** Streaming surface of the corpus build — the PER-DOCUMENT stages of
  * [[graft.text.CorpusBuild]] applied to an unbounded document stream
  * (the live-crawl front of a corpus pipeline):
  *
  *  1. quality gate — stateless, the same `TextFeatures.qualityKeep`
  *     rule as batch (shared definition, cannot drift);
  *  2. exact dedup — `dropDuplicatesWithinWatermark` on xxhash64 of
  *     the text: state is bounded by the watermark horizon (at
  *     100 TB/day, the watermark IS the dedup memory budget). The
  *     stream keeps the FIRST ARRIVAL; batch keeps the min id — the
  *     declared semantic difference (a stream cannot know a smaller
  *     id arrives later);
  *  3. test-set decontamination — the eval set is fixed and tiny, so
  *     its distinct n-grams are collected ONCE before the stream
  *     starts and evaluated map-side as a literal-array intersection
  *     (the in-session stand-in of a broadcast benchmark-gram file;
  *     same driver-bounded-artifact pattern as the bigram model);
  *  4. mixture rebalancing — the deterministic Lehmer-hash sampling
  *     filter, stateless arithmetic identical to batch.
  *
  * Near-dup clustering and corpus-wide line dedup are declared
  * BATCH-ONLY: both need corpus-global transitive state (a pair
  * evidence closure / a global line df) that an append stream cannot
  * hold — the hybrid a production pipeline actually runs: stream the
  * per-document gates, batch the corpus-global passes over the
  * accumulated store.
  */
object CorpusStream {

  def filtered(docs: Dataset[DocAt], eval: DataFrame,
               deconN: Int = 8,
               rates: Map[String, Double] = Map.empty,
               defaultRate: Double = 1.0,
               watermarkDelay: String = "10 seconds"): DataFrame = {
    // driver-bounded: the benchmark set does not grow with the corpus
    val evalGrams: Array[String] = eval
      .select(explode(graft.functions.WordShingles(col("text"), deconN)).as("g"))
      .distinct().collect().map(_.getString(0))
    val quality = docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .filter(TextFeatures.qualityKeep(col("text")))
      .withColumn("_h", xxhash64(col("text")))
      .dropDuplicatesWithinWatermark("_h")
    val clean = quality.filter(size(array_intersect(
      graft.functions.WordShingles(col("text"), deconN),
      typedlit(evalGrams))) === 0)
    TextFeatures.sampleStratified(clean, col("doc_id"), col("lang"),
        rates, defaultRate)
      .select("ts", "doc_id", "text", "lang", "source")
  }
}
