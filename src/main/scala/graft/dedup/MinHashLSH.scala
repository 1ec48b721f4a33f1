package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-duplicate detection — the 100 TB path.
  *
  * text -> (one pass, map-only) k-permutation MinHash signature ->
  * band hashes -> bucket join for candidates -> exact-Jaccard
  * verification of candidates only. Cost is a single scan of the
  * corpus for signatures (NO shuffle — see functions.MinHashSignature
  * for why signatures are computed inside the row rather than via
  * explode + k-column min aggregate), plus shuffles proportional to
  * the (small) candidate set. The all-pairs inverted-index join of
  * `Dedup.jaccardPairs` is the correctness oracle at test scale.
  *
  * All hashing is deterministic (fixed seeds) so results are stable
  * across runs and partitionings.
  */
object MinHashLSH {

  /** (doc_id, minhash signature of length k) — map-only. Docs with no
    * shingles (fewer than shingleK words) produce no row. */
  def signatures(df: DataFrame, id: Column, text: Column, shingleK: Int, k: Int): DataFrame =
    df.select(id.as("doc_id"),
        graft.functions.MinHashSignature(text, shingleK, k).as("sig"))
      .filter(col("sig").isNotNull)

  /** Candidate pairs from `bands` bands of `rowsPerBand` signature
    * rows. One shuffle of (doc_id, band, hash) rows into bucket groups
    * — the signature arrays never enter the shuffle. A bucket holding b
    * docs implies ~b²/2 candidate pairs; buckets past `bucketCap` are a
    * near-certain pile of one template/empty-text class, so instead of
    * quadratic expansion — or silently dropping them, which would lose
    * every pair of a mega duplicate class — they are routed as STAR
    * edges (min doc -> each other doc): connectivity of the class is
    * preserved for downstream clustering at b-1 pairs instead of b²/2,
    * and the exact-Jaccard verify still vouches for every emitted pair. */
  def candidatePairs(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                     bucketCap: Long = 100000L): DataFrame = {
    val banded = sigs.select(col("doc_id"),
      posexplode(graft.functions.BandHashes(col("sig"), bands)).as(Seq("band", "bh")))
    val groups = banded.groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("_ds"))
      .filter(size(col("_ds")) >= 2)
    val quadratic = Postings.expandOrderedPairs(
      groups.filter(size(col("_ds")) <= bucketCap))
    val star = groups.filter(size(col("_ds")) > bucketCap)
      .select(element_at(col("_ds"), 1).as("d1"),
        explode(slice(col("_ds"), 2, 2147483647)).as("d2"))
    quadratic.union(star).distinct()
  }

  /** Full pipeline: LSH candidates verified by EXACT Jaccard >=
    * threshold. Candidate pairs are already enumerated, so verification
    * needs no posting join at all: shingle only the candidate docs
    * (semi-join runs BEFORE the shingle projection, so the rest of the
    * corpus is never shingled), join each pair's two distinct-shingle
    * arrays back by doc id, and take `size(array_intersect)`. No df cap
    * anywhere — surviving pairs carry their TRUE Jaccard, so the output
    * is exactly the exact-Jaccard pair set restricted to LSH candidates
    * (false positives are impossible; band-miss is the only
    * approximation). Per-pair cost is linear in document length, and at
    * 100 TB the candidate set is a sliver of the corpus. */
  def nearDupPairs(df: DataFrame, id: Column, text: Column, shingleK: Int = 3,
                   k: Int = 64, bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // signatures feed every band bucket; persist the (small: one row
    // per doc) signature table so the per-doc shingling +
    // k-permutation pass runs once, not twice.
    val sigs = signatures(df, id, text, shingleK, k).persist(lvl)
    sigs.count() // materialize before the band fan-out
    // cand feeds the doc-id union (twice) and the verify join
    val cand = candidatePairs(sigs, bands, k / bands).persist(lvl)
    val docs = cand.select(col("d1").as("__cid"))
      .union(cand.select(col("d2").as("__cid"))).distinct()
    val arr = df.join(docs, id === col("__cid"), "left_semi")
      .select(id.as("doc_id"), graft.functions.WordShingles(text, shingleK).as("shs"))
      .filter(size(col("shs")) > 0)
      .persist(lvl)
    arr.count() // also populates cand's cache (arr semi-joins the candidate ids)
    // sigs fed cand only, and cand is materialized now: drop it here;
    // cand + arr are last read by the returned verify join
    sigs.unpersist(blocking = false)
    graft.functions.CacheRelease.afterNextExecution(cand)
    graft.functions.CacheRelease.afterNextExecution(arr)
    cand
      .join(arr.select(col("doc_id").as("d1"), col("shs").as("_s1")), Seq("d1"))
      .join(arr.select(col("doc_id").as("d2"), col("shs").as("_s2")), Seq("d2"))
      .withColumn("inter", size(array_intersect(col("_s1"), col("_s2"))).cast("long"))
      .withColumn("_jraw", col("inter").cast("double") /
        (size(col("_s1")) + size(col("_s2")) - col("inter")))
      .filter(col("_jraw") >= threshold)
      .withColumn("jaccard", graft.functions.Numeric.cround(col("_jraw"), 6))
      .select("d1", "d2", "jaccard")
  }
}
