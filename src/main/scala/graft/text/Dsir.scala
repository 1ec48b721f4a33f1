package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BigramCounts, BigramModel, BigramScore, Numeric}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * pick the pre-training documents that look like a TARGET domain by
  * importance weight under two cheap hashed-n-gram language models —
  * `log w(x) = log p_target(x) − log p_raw(x)` — then Gumbel-top-k
  * resample on the weights, which preserves raw-corpus diversity
  * where a hard top-k would collapse onto near-duplicates of the
  * target. The reference pipeline has no data-selection stage; this is
  * the corpus-curation step a 100 TB pre-training build runs between
  * quality filtering and mixture sampling ([[Mixture]]).
  *
  * Both models are add-one-smoothed character-bigram LMs over the SAME
  * vocabulary (every bigram the corpus contains), so target-unseen
  * bigrams get mass `1/(totT + V)` and the weight is defined for every
  * document — the paper's smoothed hashed-feature formulation with
  * [[TextFeatures.charBigramEntropy]]'s 39²-capped alphabet as the
  * feature hash. Declared deviation: documents here are variable
  * length (the paper scores fixed-size chunks), so selection uses the
  * per-gram AVERAGE log-ratio — length normalization keeps the logit
  * O(1), where the raw sum would scale with doc length and drown the
  * Gumbel noise for long documents.
  *
  * Scale shape (identical to `charBigramEntropy`): one
  * [[BigramCounts]] kernel pass caches per-doc (bg, k) arrays; ONE
  * aggregate collapses them map-side to ≤39² rows with conditional
  * target sums riding the same pass; the DIFF model (per-bigram
  * `lp_t − lp_r`) collects driver-sized and scores in one fused
  * map-only [[BigramScore]] pass, so Σ k·(lp_t − lp_r) is
  * decimal-exact at scale 8 and aggregation-order-independent.
  * Gumbel noise is a deterministic Lehmer hash of doc_id (no RNG
  * state, bit-reproducible on any partitioning/engine), and the top-k
  * is TakeOrderedAndProject: per-partition heads, only k·partitions
  * rows reach the driver.
  */
object Dsir {

  /** Per-document importance scores against the `isTarget` slice:
    * (doc_id, n_bigrams, avg_log_ratio), avg_log_ratio rounded at 1e-6
    * like the entropy surface. Positive = more target-like than the
    * corpus average. Docs whose normalized text is shorter than one
    * bigram are dropped (no score is defined), as in
    * `charBigramEntropy`. */
  def scores(df: DataFrame, id: Column, text: Column,
             isTarget: Column, cacheKey: Option[String] = None): DataFrame =
    scored(df, id, text, isTarget, cacheKey)
      .select(col("doc_id"), col("_s.n").as("n_bigrams"),
        Numeric.cround(col("_s.lp") / col("_s.n"), 6).as("avg_log_ratio"))

  /** Gumbel-top-k resample: `k` documents drawn by perturbed logit
    * `avg_log_ratio + gumbel(doc_id)` — target-like docs are favoured,
    * but any doc can win, so the sample keeps raw-corpus diversity.
    * Returns (doc_id, skey) with the selection key rounded at 1e-6;
    * quantization ties break by doc_id, so the draw is exactly
    * reproducible cross-engine. */
  def sample(df: DataFrame, id: Column, text: Column, isTarget: Column,
             k: Int, cacheKey: Option[String] = None): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    // Lehmer uniform in (0,1) from doc_id, then standard Gumbel
    // −ln(−ln u). The +0.5 centers the 1e-6 lattice away from {0,1}.
    val u = ((col("doc_id") % 2147483647L) * 48271L % 2147483647L
      % 1000000L + lit(0.5)) / 1000000.0
    val key = Numeric.cround(
      Numeric.cround(col("_s.lp") / col("_s.n"), 6) - log(-log(u)), 6)
    scored(df, id, text, isTarget, cacheKey)
      .select(col("doc_id"), key.as("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(k)
  }

  /** Shared pass: cached per-doc gram arrays scored by the collected
    * diff model — (doc_id, _s = (n, Σ k·(lp_t − lp_r))). The diff
    * model is a train-once corpus artifact (TextFeatures.lmCached with
    * a caller-supplied corpus identity — the caller's key must also
    * identify the TARGET slice definition). */
  private def scored(df: DataFrame, id: Column, text: Column,
                     isTarget: Column,
                     cacheKey: Option[String]): DataFrame = {
    val norm = regexp_replace(lower(text), "[^a-z0-9 ]", "#")
    // parallelism floor (r17) — see Ingest.parallelismFloor
    val grams = graft.sources.Ingest.parallelismFloor(df
        .select(id.as("doc_id"), isTarget.as("_tgt"), norm.as("_t"))
        .filter(length(col("_t")) >= 2))
      .select(col("doc_id"), col("_tgt"), BigramCounts(col("_t")).as("_a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val diff = TextFeatures.lmCached(df.sparkSession, cacheKey, 20) {
      val counts = grams.select(col("_tgt"), explode(col("_a")).as("_e"))
        .groupBy(col("_e.bg").as("bg"))
        .agg(sum(col("_e.k")).as("_c"),
          sum(when(col("_tgt"), col("_e.k")).otherwise(0L)).as("_ct"))
        .collect()
      val v = counts.length.toLong
      val tot = counts.iterator.map(_.getLong(1)).sum
      val totT = counts.iterator.map(_.getLong(2)).sum
      val sorted = counts.map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      new BigramModel(
        sorted.map(_._1),
        sorted.map { case (_, c, ct) =>
          StrictMath.log((ct + 1.0) / (totT + v).toDouble) -
            StrictMath.log((c + 1.0) / (tot + v).toDouble)
        })
    }
    // the returned scoring plan is grams' last reader (on a model-cache
    // hit the internal collect never ran; either way, best-effort)
    graft.functions.CacheRelease.afterNextExecution(grams)
    grams.select(col("doc_id"), BigramScore(col("_a"), diff).as("_s"))
  }
}
