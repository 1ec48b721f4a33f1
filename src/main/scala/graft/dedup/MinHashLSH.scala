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
    * (Postings.coPairs) — the signature arrays never enter the
    * shuffle, and `bucketCap` drops degenerate mega-buckets (a bucket
    * holding b docs implies ~b² candidates; past the cap that is a
    * near-certain pile of one template/empty-text class, better
    * handled by exact dedup than a quadratic verify). */
  def candidatePairs(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                     bucketCap: Long = 100000L): DataFrame = {
    val banded = sigs.select(col("doc_id"),
      posexplode(graft.functions.BandHashes(col("sig"), bands)).as(Seq("band", "bh")))
    Postings.coPairs(banded, Seq(col("band"), col("bh")), col("doc_id"), bucketCap)
      .select(col("d1"), col("d2"))
  }

  /** Full pipeline: LSH candidates verified by exact Jaccard >= threshold.
    * `maxDf` caps posting-list fanout in the verification self-join,
    * mirroring `Dedup.jaccardPairs` (df here is measured over candidate
    * docs only — the verify scan never touches the rest of the corpus —
    * so the cap is a hot-shingle guard, not a corpus-df filter). */
  def nearDupPairs(df: DataFrame, id: Column, text: Column, shingleK: Int = 3,
                   k: Int = 64, bands: Int = 16, threshold: Double = 0.5,
                   maxDf: Long = 1000L): DataFrame = {
    // signatures feed both sides of the band self-join; persist the
    // (small: one row per doc) signature table so the per-doc shingling
    // + k-permutation pass runs once, not twice.
    val sigs = signatures(df, id, text, shingleK, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count() // materialize before the self-join fan-out
    val cand = candidatePairs(sigs, bands, k / bands)
    // exact-Jaccard verification: shingle ONLY the candidate docs (at
    // 100 TB the candidate set is a sliver of the corpus, so this is a
    // semi-joined scan, not a second full shingling pass); the
    // semi-join runs BEFORE the shingle projection so non-candidates
    // are never shingled. Set sizes are a map-side size() of the
    // per-doc distinct arrays; the intersection counts flow through
    // the single-shuffle Postings kernel with the same df-cap as
    // jaccardPairs (sizes stay uncapped, so surviving pairs' Jaccard
    // is exact).
    val docs = cand.select(col("d1").as("__cid"))
      .union(cand.select(col("d2").as("__cid"))).distinct()
    val arr = df.join(docs, id === col("__cid"), "left_semi")
      .select(id.as("doc_id"), graft.functions.WordShingles(text, shingleK).as("shs"))
      .filter(size(col("shs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    arr.count()
    val sizes = arr.select(col("doc_id"), size(col("shs")).cast("long").as("sz"))
    val post = arr.select(col("doc_id"), explode(col("shs")).as("shingle"))
    val inter = Postings.coPairs(post, Seq(col("shingle")), col("doc_id"), maxDf)
      .withColumnRenamed("shared", "inter")
    cand.join(inter, Seq("d1", "d2"))
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sz1"), Seq("d1"))
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sz2"), Seq("d2"))
      .withColumn("_jraw", col("inter").cast("double") /
        (col("sz1") + col("sz2") - col("inter")))
      .filter(col("_jraw") >= threshold)
      .withColumn("jaccard", graft.functions.Numeric.cround(col("_jraw"), 6))
      .select("d1", "d2", "jaccard")
  }
}
