package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Test-set decontamination: flag training documents that share long
  * word n-grams with an evaluation/benchmark set — the standard
  * corpus-build step (GPT-3 appendix C / Gopher section A.2 style
  * 13-gram overlap checks) that none of the pairwise dedup operators
  * cover, because contamination is corpus-vs-REFERENCE-SET overlap,
  * not corpus-internal duplication.
  *
  * Scale shape: the benchmark set is tiny and FIXED (megabytes — its
  * size does not grow with the corpus), so its distinct n-grams ride
  * as a broadcast; the corpus side is a map-only shingle explode into
  * a broadcast-hash join, and the only shuffle is the matched postings
  * (corpus grams that appear verbatim in the eval set — a vanishing
  * fraction), partially aggregated map-side. The corpus is scanned
  * exactly once and never shuffled at document grain. Shingling uses
  * the one-pass [[graft.functions.WordShingles]] kernel (distinct
  * k-grams, single codegen'd scan per document).
  */
object Decontaminate {

  /** (doc_id, eval_id, shared) for every corpus document sharing at
    * least `minShared` distinct word `n`-grams with an eval document.
    * `shared` counts distinct overlapping n-grams (both sides emit
    * distinct shingle sets, so the join is multiplicity-free).
    */
  def overlapPairs(corpus: DataFrame, corpusId: Column, corpusText: Column,
                   eval: DataFrame, evalId: Column, evalText: Column,
                   n: Int = 8, minShared: Long = 1L): DataFrame = {
    require(n >= 1 && minShared >= 1L)
    val evalSh = eval.select(evalId.as("eval_id"),
      explode(graft.functions.WordShingles(evalText, n)).as("_g"))
    val corpSh = corpus.select(corpusId.as("doc_id"),
      explode(graft.functions.WordShingles(corpusText, n)).as("_g"))
    corpSh.join(broadcast(evalSh), Seq("_g"))
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** FUZZY decontamination — the near-duplicate-level check modern
    * eval-contamination audits run alongside the verbatim n-gram gate
    * (a lightly paraphrased or re-tokenized benchmark item shares few
    * long verbatim n-grams but most of its SHORT shingles): exact
    * Jaccard similarity between each corpus document and each eval
    * document over distinct word k-grams, thresholded. Same scale
    * shape as [[overlapPairs]] — the eval side is broadcast, the
    * corpus is scanned once, only matched postings shuffle — with the
    * shingle-set sizes riding the exploded rows so the Jaccard
    * denominator needs no join-back. Exact (no MinHash needed: the
    * eval side is fixed-size, so the candidate set is already
    * index-gated). */
  def fuzzyOverlapPairs(corpus: DataFrame, corpusId: Column, corpusText: Column,
                        eval: DataFrame, evalId: Column, evalText: Column,
                        n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    require(n >= 1 && minJaccard > 0.0 && minJaccard <= 1.0)
    val evalSh = eval.select(evalId.as("eval_id"),
        graft.functions.WordShingles(evalText, n).as("_gs"))
      .select(col("eval_id"), size(col("_gs")).as("_en"),
        explode(col("_gs")).as("_g"))
    val corpSh = corpus.select(corpusId.as("doc_id"),
        graft.functions.WordShingles(corpusText, n).as("_gs"))
      .select(col("doc_id"), size(col("_gs")).as("_cn"),
        explode(col("_gs")).as("_g"))
    corpSh.join(broadcast(evalSh), Seq("_g"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"),
        max(col("_cn")).as("_cn"), max(col("_en")).as("_en"))
      .withColumn("jaccard", graft.functions.Numeric.cround(
        col("shared").cast("double")
          / (col("_cn") + col("_en") - col("shared")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id"), col("eval_id"), col("shared"), col("jaccard"))
  }

  /** The corpus with contaminated documents removed — the anti-join a
    * pipeline actually ships. Same plan shape as [[overlapPairs]] with
    * the pair evidence reduced to a distinct flagged-doc set before
    * the anti join (still broadcast-sized in any realistic setting,
    * but joined via shuffle-capable LEFT ANTI so it stays correct even
    * when a pathological eval set flags a large corpus fraction). */
  def clean(corpus: DataFrame, corpusId: Column, corpusText: Column,
            eval: DataFrame, evalId: Column, evalText: Column,
            n: Int = 8, minShared: Long = 1L): DataFrame = {
    val flagged = overlapPairs(corpus, corpusId, corpusText,
        eval, evalId, evalText, n, minShared)
      .select(col("doc_id").as("_contaminated_id")).distinct()
    corpus.join(flagged, corpusId === col("_contaminated_id"), "left_anti")
  }
}
