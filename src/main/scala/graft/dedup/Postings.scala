package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Co-occurrence pairs from an inverted index — the shared kernel of
  * every pair-generating dedup operator (Jaccard shingles, winnowing
  * fingerprints, MinHash band buckets, SimHash bands).
  *
  * The natural formulation is a posting-list SELF-JOIN on the key,
  * which shuffles the posting set TWICE (once per join side) and
  * rebuilds a hash table per key. This kernel shuffles it ONCE:
  * group by key, collect the (df-capped) sorted doc list, and expand
  * ordered pairs with generators — `posexplode` picks d1, `explode`
  * over the tail slice picks d2, so d1 < d2 by construction and no
  * post-hoc dedup or inequality filter is needed. Per-key expansion is
  * C(df, 2), bounded by the `maxDf` cap exactly like the self-join it
  * replaces (the cap is applied to the grouped list BEFORE expansion,
  * so a hot key costs one filtered row, not a quadratic blow-up).
  */
object Postings {

  /** (d1, d2, shared) for every unordered doc pair co-occurring under
    * at least `minShared` distinct keys, counting only keys whose
    * document frequency lies in [2, maxDf]. `post` must be distinct
    * (doc, key) rows — graft's shingle/fingerprint expressions emit
    * per-doc distinct arrays, so their exploded postings already are. */
  def coPairs(post: DataFrame, keys: Seq[Column], doc: Column,
              maxDf: Long, minShared: Long = 1L): DataFrame = {
    val groups = post.groupBy(keys: _*)
      .agg(sort_array(collect_list(doc)).as("_ds"))
      .filter(size(col("_ds")).between(2, maxDf))
    expandOrderedPairs(groups)
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** The generator pair expansion over a sorted `_ds` doc-list column:
    * `posexplode` picks d1, `explode` over the (1-based) tail slice
    * picks d2 — d1 < d2 by construction. ONE definition of the slice
    * arithmetic, shared by every banding caller. */
  private[dedup] def expandOrderedPairs(groups: DataFrame): DataFrame =
    groups
      .select(col("_ds"), posexplode(col("_ds")).as(Seq("_i", "d1")))
      .select(col("d1"),
        explode(slice(col("_ds"), col("_i") + lit(2),
          size(col("_ds")) - col("_i") - lit(1))).as("d2"))
}
