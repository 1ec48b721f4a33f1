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

  /** Shared gate defaults — one definition for the batch and
    * streaming front doors, so the surfaces cannot drift. */
  val DefaultMaxLinkDensity = 0.3
  val DefaultMinChars = 10

  // tag-name BOUNDARIES are explicit ("<a>" or "<a ...>", never
  // "<article>"), and an UNCLOSED script/style opener (a truncated
  // fetch) swallows to end-of-input rather than leaking raw code
  // into the text; the whitespace class is spelled out because Java
  // regex and RE2 disagree on \s (vertical tab)
  private val blockPat =
    "(?s)(<script(\\s[^>]*)?>.*?</script>|<style(\\s[^>]*)?>.*?</style>)"
  private val unclosedPat = "(?s)(<script(\\s[^>]*)?>|<style(\\s[^>]*)?>).*$"
  private val anchorPat = "(?s)<a(?:\\s[^>]*)?>(.*?)</a>"
  private val tagPat = "<[^>]*>"
  private val wsPat = "[ \\t\\n\\r\\f\\x0B]+"

  def extract(df: DataFrame, id: Column, html: Column,
              maxLinkDensity: Double = DefaultMaxLinkDensity,
              minChars: Int = DefaultMinChars): DataFrame = {
    val noBlocks = regexp_replace(
      regexp_replace(html, blockPat, ""), unclosedPat, "")
    val anchors = regexp_extract_all(noBlocks, lit(anchorPat), lit(1))
    val clean = trim(regexp_replace(
      regexp_replace(noBlocks, tagPat, " "), wsPat, " "))
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
