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
    val fps = df.select(id.as("doc_id"),
        explode(graft.functions.Winnow(text, k, w)).as("fp"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fps.count() // materialize once; four consumers below
    val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val dfreq = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
    val post = fps.join(dfreq.select("fp"), Seq("fp"))
    val pairs = post.as("a").join(post.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
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
    // The shingle set feeds four consumers (sizes, doc-freq, both sides
    // of the inverted-index join); without persist Spark re-shingles the
    // corpus for each — at 100 TB that is 4 full passes.
    val sh = shingles(df, id, text, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.count() // materialize once; lazy persist would be computed by each branch
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
    val posting = sh.join(dfreq.select("shingle"), Seq("shingle"))
    val pairs = posting.as("a").join(posting.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
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
