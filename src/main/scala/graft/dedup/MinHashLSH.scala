package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-duplicate detection — the 100 TB path.
  *
  * shingle -> xxhash64 -> k universal-hash permutations -> per-doc min
  * per permutation -> band hashes -> bucket join for candidates ->
  * exact-Jaccard verification of candidates only. Cost is linear in
  * corpus size plus the (small) candidate set; the all-pairs join of
  * `Dedup.jaccardPairs` is the correctness oracle at test scale.
  *
  * All hashing is deterministic (fixed seeds) so results are stable
  * across runs and partitionings.
  */
object MinHashLSH {

  /** (doc_id, minhash array of length k). Permutation i is the seeded
    * hash xxhash64(shingle, i) — k independent hash families with no
    * modular arithmetic (Spark 4 ANSI mode forbids overflowing
    * multiply-shift hashing). */
  def signatures(df: DataFrame, id: Column, text: Column, shingleK: Int, k: Int): DataFrame =
    signaturesFromShingles(Dedup.shingles(df, id, text, shingleK), k)

  def signaturesFromShingles(sh: DataFrame, k: Int): DataFrame = {
    // one string hash per posting; k permutations are cheap long
    // multiplies (custom Expression — see MinHashPerms)
    val perms = sh.withColumn("_perms",
      graft.functions.MinHashPerms(xxhash64(col("shingle")), k))
    val mins = (0 until k).map(i => min(element_at(col("_perms"), i + 1)).as(s"m$i"))
    perms.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Candidate pairs from `bands` bands of `rowsPerBand` signature rows. */
  def candidatePairs(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws("_", b, slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand))
          .cast("array<string>"))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Full pipeline: LSH candidates verified by exact Jaccard >= threshold. */
  def nearDupPairs(df: DataFrame, id: Column, text: Column, shingleK: Int = 3,
                   k: Int = 64, bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    // shingles feed the signatures AND the verification join: persist to
    // avoid re-shingling the corpus (see Dedup.jaccardPairs).
    val shAll = Dedup.shingles(df, id, text, shingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shAll.count() // materialize before fan-out (see Dedup.jaccardPairs)
    // signatures feed both sides of the band self-join; persist the
    // (small: one row per doc) signature table to avoid recomputing the
    // 64-way min-aggregate twice.
    val sigs = signaturesFromShingles(shAll, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    val cand = candidatePairs(sigs, bands, k / bands)
    val sh = shAll
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // verify candidates only: semi-restrict postings to candidate docs
    val docs = cand.select(col("d1").as("doc_id"))
      .union(cand.select(col("d2").as("doc_id"))).distinct()
    val post = sh.join(docs, Seq("doc_id"))
    val inter = post.as("a").join(post.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
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
