package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.text.Html

/** One timestamped fetched page for the streaming crawl front door. */
case class PageAt(ts: Timestamp, doc_id: Long, html: String)

/** STREAMING HTML boilerplate extraction — the crawl pipeline's
  * front door run where it actually sits in production: on the fetch
  * stream, BEFORE anything accumulates into the document store (the
  * same live-vs-audit positioning as [[SemDeconStream]]). The batch
  * kernel ([[graft.text.Html.extract]]) is three codegen'd regex
  * passes per row — MAP-ONLY, zero state — so it streams unchanged:
  * no watermark, no late-data semantics, every fetched page emits
  * exactly one extracted row, and streamed rows are row-for-row
  * identical to the batch operator on the same pages (the spec's
  * parity pin). Downstream, the kept gate feeds [[CorpusStream]]'s
  * per-document stages (quality, dedup-within-watermark,
  * decontamination, mixture) — markup never reaches them. */
object HtmlStream {

  /** Extract each arriving page; `keptOnly` drops gated-out pages
    * in-stream (the production setting — boilerplate never lands on
    * disk). Append-mode output: the batch contract per arrival. */
  def extracted(stream: Dataset[PageAt],
                maxLinkDensity: Double = Html.DefaultMaxLinkDensity,
                minChars: Int = Html.DefaultMinChars,
                keptOnly: Boolean = true): DataFrame = {
    val out = Html.extract(stream.toDF(), col("doc_id"), col("html"),
      maxLinkDensity, minChars)
    if (keptOnly) out.filter(col("kept") === 1) else out
  }
}
