package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source/domain-level quality gating — the C4 / RefinedWeb / Gopher
  * pattern of filtering at the PROVENANCE grain, not the document
  * grain: a domain whose documents are mostly junk, near-empty, or
  * self-duplicating is cut wholesale, because per-doc filters leak its
  * borderline members and the domain's pathology (SEO farms, template
  * mirrors) is only visible in aggregate.
  *
  * Two-phase shape, the only one that scales: ONE corpus pass
  * aggregates per-source health stats (the output is |sources| rows —
  * millions at web scale, but kilobytes per row and trivially
  * broadcastable after the gate cut), then the doc-level filter is a
  * broadcast semi join — the corpus is never shuffled.
  *
  * The per-doc keep signal is [[TextFeatures.qualityKeep]] — the same
  * rule the per-doc gate and the composed corpus build use, so a
  * source's keep_rate is exactly the fraction of its docs the doc-level
  * filter would keep (no drift between the two grains by construction).
  */
object SourceGate {

  /** Per-source health stats + the gate decision.
    * dup_ratio = 1 - distinct(text)/n (within-source exact-dup mass,
    * hashed so the distinct shuffles 8 bytes not documents). */
  def stats(df: DataFrame, id: Column, text: Column, source: Column,
            minDocs: Long = 10L, minKeepRate: Double = 0.6,
            maxDupRatio: Double = 0.5): DataFrame = {
    import graft.functions.Numeric.cround
    df.select(source.as("source"),
        TextFeatures.qualityKeep(text).cast("int").as("_keep"),
        xxhash64(text).as("_h"), length(text).cast("long").as("_len"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        cround(avg(col("_keep")), 4).as("keep_rate"),
        cround(lit(1.0) -
          countDistinct(col("_h")).cast("double") / count(lit(1)), 4).as("dup_ratio"),
        cround(avg(col("_len")), 4).as("mean_chars"))
      .withColumn("gated_in",
        (col("n_docs") >= minDocs && col("keep_rate") >= minKeepRate &&
          col("dup_ratio") <= maxDupRatio).cast("int"))
  }

  /** Documents from gated-in sources only: the stats table collapses
    * to a source keep-list (tiny after the cut) and the corpus filter
    * is a broadcast left-semi join — no corpus shuffle. */
  def filterDocs(df: DataFrame, id: Column, text: Column, source: Column,
                 minDocs: Long = 10L, minKeepRate: Double = 0.6,
                 maxDupRatio: Double = 0.5): DataFrame = {
    val keep = stats(df, id, text, source, minDocs, minKeepRate, maxDupRatio)
      .filter(col("gated_in") === 1).select(col("source").as("_gate_src"))
    df.join(broadcast(keep), source === col("_gate_src"), "left_semi")
  }
}
