package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline. */
object Dedup {

  /** Exact dedup: hash-groupBy on the full text, keep the lowest id.
    * One shuffle on the group key; at 100 TB, group on a 128-bit hash of
    * the text instead of the text itself to shrink shuffle width —
    * provided here via `byKey`. */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(text.as("t"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Exact dedup keyed on xxhash64(text): same semantics at far lower
    * shuffle cost (the scale path; collision probability ~n^2/2^64). */
  def exactByHash(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(xxhash64(text).as("h"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Distinct word-k-shingles per document: (doc_id, shingle).
    * One-pass custom Expression (see WordShingles for why not the
    * composable transform/slice/concat_ws formulation). */
  def shingles(df: DataFrame, id: Column, text: Column, k: Int): DataFrame =
    df.select(id.as("doc_id"),
      explode(graft.functions.WordShingles(text, k)).as("shingle"))

  /** Cross-document containment pairs via winnowing fingerprints (the
    * MOSS detector): two documents sharing >= minShared winnowed
    * k-gram hashes overlap in content even when neither is a near-copy
    * of the whole other — the partial-overlap case Jaccard-style
    * whole-document dedup misses (boilerplate headers, quoted spans,
    * template reuse). Same inverted-index shape as `jaccardPairs`
    * (posting df-cap bounds hot-fingerprint fanout; never cartesian);
    * `containment` = shared / min(|fps|) is the asymmetric overlap
    * score. */
  def winnowContainment(df: DataFrame, id: Column, text: Column,
                        k: Int = 8, w: Int = 4, minShared: Long = 3L,
                        maxDf: Long = 1000L): DataFrame = {
    // Winnow emits the per-doc DISTINCT fingerprint set, so per-doc
    // sizes are a map-side size() and the exploded postings need no
    // dedup shuffle; the compact per-doc arrays (not the exploded
    // postings) are what persists for the two consumers.
    val arr = graft.sources.Ingest.parallelismFloor(df)
      .select(id.as("doc_id"), graft.functions.Winnow(text, k, w).as("fps"))
      .filter(size(col("fps")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    arr.count() // materialize once; sizes + postings both read it
    val sizes = arr.select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"))
    val post = arr.select(col("doc_id"), explode(col("fps")).as("fp"))
    val pairs = Postings.coPairs(post, Seq(col("fp")), col("doc_id"), maxDf, minShared)
    // the returned plan is arr's last reader (best-effort cleanup)
    graft.functions.CacheRelease.afterNextExecution(arr)
    pairs
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_fp", "n1"), Seq("d1"))
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_fp", "n2"), Seq("d2"))
      .withColumn("containment", graft.functions.Numeric.cround(
        col("shared").cast("double") / least(col("n1"), col("n2")), 6))
      .select("d1", "d2", "shared", "containment")
  }

  /** Near-dup clustering + canonical selection — the step an actual
    * dedup pipeline ENDS with: pairwise near-dup evidence (from any of
    * the pair generators: Jaccard, MinHash-LSH, SimHash, cosine) is
    * transitively closed into clusters and one canonical document is
    * kept per cluster (min doc id — deterministic and
    * generator-independent). Pair lists give no keep-list directly:
    * A~B and B~C must collapse to ONE kept doc even when A~C was never
    * emitted, which is exactly connected components over the pair
    * graph (the same O(log n) alternating-star machinery as track
    * assignment — dup clusters at corpus scale are overwhelmingly
    * tiny, so rounds converge fast and no cluster is ever collected).
    * Output: every document with its cluster canonical and a keep
    * flag; docs in no pair are their own canonical.
    */
  def clusters(docs: DataFrame, id: Column, pairs: DataFrame): DataFrame = {
    val cc = graft.operators.ConnectedComponents.run(
      pairs.select(col("d1").as("src"), col("d2").as("dst")))
    docs.select(id.as("doc_id"))
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("canonical_id"))
      .withColumn("keep",
        (col("doc_id") === col("canonical_id")).cast("int"))
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted-index join on
    * shingles. `maxDf` prunes ultra-common shingles (bounded fanout —
    * the classic posting-list cap); every surviving pair's Jaccard is
    * exact because set sizes are computed before pruning and the
    * intersection count uses only co-occurring shingles: pairs whose
    * every shared shingle is pruned can be missed only if all their
    * common shingles are corpus-stopwords, which the threshold test
    * tolerates at the chosen maxDf.
    */
  def jaccardPairs(df: DataFrame, id: Column, text: Column,
                   k: Int = 3, threshold: Double = 0.5, maxDf: Long = 1000L): DataFrame = {
    // WordShingles emits the per-doc DISTINCT shingle set, so set sizes
    // are a map-side size() over the compact per-doc arrays; only those
    // arrays persist (sizes + postings read them — without persist the
    // corpus would be re-shingled per consumer, two full passes at
    // 100 TB).
    val arr = graft.sources.Ingest.parallelismFloor(df).select(id.as("doc_id"),
        graft.functions.WordShingles(text, k).as("shs"))
      .filter(size(col("shs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    arr.count() // materialize once; lazy persist would be computed by each branch
    val sizes = arr.select(col("doc_id"), size(col("shs")).cast("long").as("sz"))
    val post = arr.select(col("doc_id"), explode(col("shs")).as("shingle"))
    val pairs = Postings.coPairs(post, Seq(col("shingle")), col("doc_id"), maxDf)
      .withColumnRenamed("shared", "inter")
    // the returned plan is arr's last reader (best-effort cleanup)
    graft.functions.CacheRelease.afterNextExecution(arr)
    pairs
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sz1"), Seq("d1"))
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sz2"), Seq("d2"))
      .withColumn("_jraw", col("inter").cast("double") /
        (col("sz1") + col("sz2") - col("inter")))
      .filter(col("_jraw") >= threshold)
      .withColumn("jaccard", graft.functions.Numeric.cround(col("_jraw"), 6))
      .select("d1", "d2", "inter", "jaccard")
  }
}
