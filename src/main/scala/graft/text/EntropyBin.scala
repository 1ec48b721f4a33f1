package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perplexity-stratified balanced sampling — the curation move between
  * hard quality FILTERING (cut everything above a threshold) and
  * training on the raw mix: bin documents by their corpus
  * cross-entropy and keep an exact per-bin quota, so the kept subset
  * spans the model-quality spectrum instead of collapsing onto the
  * most-typical mass (the same motivation as DoReMi/DSIR-adjacent
  * perplexity-bucketed mixes, realized with the deterministic
  * machinery already on hand).
  *
  * Composition, fully oracled: charBigramEntropy's fused scoring pass
  * (one corpus scan + a driver-sized model), a map-only fixed-width
  * bin (`floor(ce / binWidth)` — the rounded score is engine-identical
  * so the bin edge cannot disagree), and SampleK's exact per-group
  * quota (counting aggregate + boundary-bucket window, no per-bin
  * sort). */
object EntropyBin {
  def sample(df: DataFrame, id: Column, text: Column,
             binWidth: Double = 0.05, k: Int = 20,
             cacheKey: Option[String] = None): DataFrame = {
    require(binWidth > 0.0)
    val scored = TextFeatures.charBigramEntropy(df, id, text, cacheKey)
      .select(col("doc_id"),
        floor(col("cross_entropy") / binWidth).cast("long").as("bucket"))
    SampleK.sampleExactK(scored, col("doc_id"), col("bucket"), k)
      .select(col("doc_id"), col("grp").as("bucket"))
  }
}
