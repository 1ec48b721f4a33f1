package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Numeric

/** HTML boilerplate extraction — the front door of a crawl pipeline
  * (the C4/CCNet step that turns fetched markup into trainable text):
  * script/style blocks removed whole, remaining tags stripped, runs of
  * whitespace squeezed, and the classic LINK-DENSITY signal (fraction
  * of text living inside anchors — high density marks navigation
  * boilerplate) computed alongside, feeding a keep gate.
  *
  * Scale shape: MAP-ONLY — three regex passes plus length arithmetic
  * per row, whole-stage-codegen'd, no shuffle, no state; the 100 TB
  * cost is the scan. Patterns are deliberately simple (lowercase tag
  * names, no backtracking constructs) so the Java-regex (Spark) and
  * RE2 (DuckDB oracle) dialects agree symbol-for-symbol — the same
  * cross-engine-parity discipline as the engine's hash kernels.
  *
  * Definitions (pinned by spec + oracle): `text` is the tag-stripped,
  * whitespace-squeezed body after script/style removal (tags become
  * spaces so adjacent words never fuse); `n_links` counts anchor
  * elements; `anchor_chars` measures the raw inner HTML of anchors
  * (nested markup counts toward the boilerplate signal);
  * `link_density` = anchor_chars / length(text), 0 for empty text;
  * `kept` = density <= maxLinkDensity AND length >= minChars. */
object Html {

  private val blockPat = "(?s)(<script[^>]*>.*?</script>|<style[^>]*>.*?</style>)"
  private val anchorPat = "(?s)<a[^>]*>(.*?)</a>"
  private val tagPat = "<[^>]*>"

  def extract(df: DataFrame, id: Column, html: Column,
              maxLinkDensity: Double = 0.3, minChars: Int = 10): DataFrame = {
    val noBlocks = regexp_replace(html, blockPat, "")
    val anchors = regexp_extract_all(noBlocks, lit(anchorPat), lit(1))
    val clean = trim(regexp_replace(
      regexp_replace(noBlocks, tagPat, " "), "\\s+", " "))
    df.select(id.as("doc_id"),
        clean.as("text"),
        size(anchors).as("n_links"),
        aggregate(anchors, lit(0L), (acc, a) => acc + length(a))
          .as("anchor_chars"))
      .withColumn("link_density", Numeric.cround(
        when(length(col("text")) === 0, lit(0.0))
          .otherwise(col("anchor_chars").cast("double") /
            length(col("text")).cast("double")), 6))
      .withColumn("kept",
        (col("link_density") <= maxLinkDensity &&
          length(col("text")) >= minChars).cast("int"))
  }
}
