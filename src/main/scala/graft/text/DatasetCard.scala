package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-card rollup — the one-row corpus summary every released
  * training set ships (doc/token/char mass, language mix, exact-dup
  * mass, quality-gate pass rate): the numbers a consumer reads before
  * deciding to train on it, and the regression surface a corpus CI
  * diffs release-over-release (compose with [[SnapshotDiff]] /
  * [[CorpusDiff]] for the "what changed" layer).
  *
  * ONE corpus scan: every signal is computed in a single
  * map-side-combined aggregate (the quality rule and token counts are
  * map-side expressions; dup mass via countDistinct's two-phase hash;
  * the per-language token masses as conditional sums over the SAME
  * pass — no per-language scan). Output is one row of scalars, so the
  * driver compare and any downstream join are trivial. */
object DatasetCard {

  /** `langs` fixes the per-language columns (a released card names its
    * languages; everything else folds into `other_tokens`). */
  def card(df: DataFrame, id: Column, text: Column, lang: Column,
           langs: Seq[String] = Seq("en", "zh", "de", "es", "fr")): DataFrame = {
    val base = df.select(id.as("_id"), text.as("_t"), lang.as("_l"),
      size(split(text, "\\s+")).cast("long").as("_tok"),
      TextFeatures.qualityKeep(text).cast("long").as("_keep"),
      xxhash64(text).as("_h"))
    val aggs: Seq[Column] =
      Seq(
        count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("n_tokens"),
        sum(length(col("_t")).cast("long")).as("n_chars"),
        countDistinct(col("_h")).as("n_distinct_texts"),
        graft.functions.Numeric.cround(
          lit(1.0) - countDistinct(col("_h")).cast("double") / count(lit(1)), 6)
          .as("dup_ratio"),
        graft.functions.Numeric.cround(avg(col("_keep")), 6).as("keep_rate")) ++
      langs.map(l =>
        sum(when(col("_l") === l, col("_tok")).otherwise(0L)).as(s"${l}_tokens"))
    // other_tokens by SUBTRACTION, not a NOT-IN predicate: a null lang
    // fails both `=== l` and `NOT isin`, and its mass must land in
    // other_tokens (the card's partition invariant: named columns +
    // other_tokens == n_tokens, always)
    base.agg(aggs.head, aggs.tail: _*)
      .withColumn("other_tokens",
        col("n_tokens") - langs.map(l => col(s"${l}_tokens"))
          .reduce(_ + _))
  }
}
