package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One timestamped document on the ingest feed for card monitoring. */
case class CardAt(ts: Timestamp, doc_id: Long, text: String, lang: String)

/** Streaming per-window dataset card — the streaming surface of
  * [[graft.text.DatasetCard]] (SURVEY §2.3 row 30t): the corpus-health
  * numbers (doc/token/char mass, quality pass rate, language mix,
  * duplicate mass) per event-time window of a live feed — the
  * ingest-side dashboard row that pairs with [[DriftStream]]'s alarm.
  *
  * Every aggregate is ALGEBRAIC, so this is Spark's native
  * watermark-closed windowed aggregation — no custom state function:
  * the per-doc signals (token count, qualityKeep, text hash) are
  * map-side expressions, and the duplicate-mass distinct uses the HLL
  * sketch aggregate (approx_count_distinct) because exact distinct is
  * not a streaming-mergeable aggregate — the DECLARED divergence from
  * the batch card's exact countDistinct. HLL merge is commutative and
  * associative over the same data, so the stream estimate equals the
  * batch estimate on the same window membership exactly (spec-pinned),
  * and the batch card remains the exact-number surface. */
object CardStream {

  def windowedCard(docs: Dataset[CardAt], windowSec: Long,
                   langs: Seq[String] = Seq("en", "zh", "de", "es", "fr"),
                   watermarkDelay: String = "10 seconds"): DataFrame = {
    require(windowSec > 0)
    val base = docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col("lang"),
        length(col("text")).cast("long").as("_chars"),
        size(split(col("text"), "\\s+")).cast("long").as("_tok"),
        graft.text.TextFeatures.qualityKeep(col("text")).cast("long").as("_keep"),
        xxhash64(col("text")).as("_h"))
    val aggs =
      Seq(count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("n_tokens"),
        sum(col("_chars")).as("n_chars"),
        approx_count_distinct(col("_h")).as("n_distinct_est"),
        graft.functions.Numeric.cround(avg(col("_keep")), 6).as("keep_rate")) ++
      langs.map(l =>
        sum(when(col("lang") === l, col("_tok")).otherwise(0L)).as(s"${l}_tokens"))
    base.groupBy(window(col("ts"), s"$windowSec seconds").as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").cast("long").as("window_start") +:
        (Seq("n_docs", "n_tokens", "n_chars", "n_distinct_est", "keep_rate") ++
          langs.map(l => s"${l}_tokens")).map(col): _*)
  }
}
