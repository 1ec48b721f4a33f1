package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Numeric

/** Group mean-pooling of embedding columns — one operator, three
  * production faces: chunk-to-document pooling (a document's
  * embedding is the mean of its chunk embeddings — the standard way
  * long documents get one vector), class centroids (the anchors
  * hard-negative mining and prototype classifiers want), and
  * source/domain mean embeddings (corpus-drift monitoring in
  * embedding space).
  *
  * Scale shape: the embedding explodes to (group, dim, value) rows —
  * a dim× row amplification of 16-byte rows that MAP-SIDE partial
  * aggregation collapses to |groups|·dim partials before the one
  * exchange; the shuffle carries group-grain sums, never vectors.
  * Output at (group, dim) grain — scalar columns, so any engine/sink
  * consumes it without list-type friction; re-collecting to arrays is
  * a caller-side sort_array(collect_list) when wanted.
  *
  * Parity contract: per-dimension sums ride decimal(28,8)
  * ([[Numeric.dsum]]) so the mean is independent of partitioning and
  * row order — bit-stable across engines; output rounds via
  * [[Numeric.cround]]. */
object Pooling {

  /** Mean embedding per group: (grp, i, n_vecs, mean) with i the
    * 0-based dimension index. */
  def meanByGroup(df: DataFrame, group: Column, emb: Column): DataFrame =
    df.select(group.as("grp"), posexplode(emb).as(Seq("i", "_v")))
      .groupBy(col("grp"), col("i"))
      .agg(count(lit(1)).as("n_vecs"),
        Numeric.davg(col("_v").cast("double"), 8, 6).as("mean"))
}
