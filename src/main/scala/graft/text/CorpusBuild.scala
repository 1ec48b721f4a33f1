package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.{Decontaminate, Dedup}

/** The END of the training-data mandate: the whole corpus build as one
  * composed query — quality gate, exact dedup, near-dup cluster keep,
  * test-set decontamination, mixture rebalancing — each stage running
  * on the survivors of the previous one, exactly the filter chain a
  * production pre-training pipeline ships (Gopher table A1 /
  * RefinedWeb fig. 2 ordering). Every stage is an already-oracled
  * graft operator; this endpoint pins their COMPOSITION, which is
  * where off-by-one-stage bugs (deduping before filtering, sampling
  * before decontamination) actually live.
  *
  * Scale shape = the union of its stages' shapes: the quality gate is
  * map-only and pushdown-friendly; exact dedup groups on xxhash64 of
  * the text (the shuffle carries 8-byte keys, not documents — a 2^-64
  * collision would differ from grouping on the raw text, the declared
  * tradeoff) and semi-joins the keep-ids back; near-dup pairs ride the
  * single-shuffle posting kernel; decontamination broadcasts the
  * fixed-size eval shingle set; sampling is a map-only arithmetic
  * filter. The post-dedup survivor set is persisted once and feeds
  * pair generation, the cluster keep join, and decontamination.
  *
  * Expects documents-shaped input: (doc_id, text, lang, source).
  */
object CorpusBuild {

  def run(corpus: DataFrame, eval: DataFrame,
          shingleK: Int = 3, threshold: Double = 0.5, maxDf: Long = 1000L,
          deconN: Int = 8,
          rates: Map[String, Double] = Map.empty,
          defaultRate: Double = 1.0,
          sourceGate: Option[(Long, Double, Double)] = None): DataFrame = {
    // 0. (optional) provenance gate — cut pathological SOURCES wholesale
    // BEFORE any per-doc stage (r8: the C4/RefinedWeb ordering — a junk
    // domain's borderline members must not leak through the doc gate);
    // SourceGate shares qualityKeep, so the two grains cannot drift
    val gated = sourceGate match {
      case None => corpus
      case Some((minDocs, minKeepRate, maxDupRatio)) =>
        SourceGate.filterDocs(corpus, col("doc_id"), col("text"),
          col("source"), minDocs, minKeepRate, maxDupRatio)
    }
    // 1. quality gate (map-only; the same rule TextFeatures.quality reports)
    val q = gated.filter(TextFeatures.qualityKeep(col("text")))
    // 2. exact dedup: keep the min doc_id per identical text
    val keepIds = q.groupBy(xxhash64(col("text")).as("_h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val ex = q.join(keepIds, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 3. near-dup cluster keep: canonical (min-id) doc per cluster
    val pairs = Dedup.jaccardPairs(ex, col("doc_id"), col("text"),
      shingleK, threshold, maxDf)
    val canon = Dedup.clusters(ex, col("doc_id"), pairs)
      .filter(col("keep") === 1).select("doc_id")
    val nd = ex.join(canon, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK) // read by decon's shingle pass AND its anti join
    // 4. test-set decontamination
    val dc = Decontaminate.clean(nd, col("doc_id"), col("text"),
      eval, col("doc_id"), col("text"), deconN)
    // ex's cache was populated by the stage-3 internal actions and is
    // last read when the caller's action computes nd; nd's last
    // readers are the decon subtrees of the returned plan. Both
    // release after that one action (best-effort cleanup).
    graft.functions.CacheRelease.afterNextExecution(ex)
    graft.functions.CacheRelease.afterNextExecution(nd)
    // 5. mixture rebalancing (deterministic Lehmer-hash sampling)
    TextFeatures.sampleStratified(dc, col("doc_id"), col("lang"),
        rates, defaultRate)
      .select("doc_id", "lang", "source")
  }
}
