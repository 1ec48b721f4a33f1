package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-NN-graph semantic near-dup clustering — the graph-ANN route to
  * embedding dedup at corpus scale: instead of generating candidate
  * pairs from IVF cells ([[SemDedup]]) or LSH buckets
  * ([[Similarity.cosineDupPairs]]), build the K-NN graph ONCE
  * ([[NnDescent]], ~O(n^1.14) exact comparisons), keep the edges at
  * or above the duplicate threshold, and transitively close them —
  * the same evidence-closure + canonical-keep contract as every other
  * dedup member ([[graft.dedup.Dedup.clusters]]).
  *
  * When is the edge set COMPLETE? A vector's ≥threshold neighbors all
  * appear among its top-k exact neighbors whenever its ≥threshold
  * DEGREE is at most k (cosine orders them first by definition) — so
  * k is an explicit degree budget, not a heuristic: pick k at or
  * above the corpus's max near-dup degree and the TRUE k-NN graph
  * contains every qualifying pair. What stays approximate is
  * NN-descent itself (measured recall 0.94–0.998 at overbuild 2, the
  * declared build tradeoff), so clusters are approximate-by-design at
  * scale; the spec pins exact parity empirically on the test corpora
  * and the registry documents the residual. The clustering cost on
  * top of the build is output-sized: the edge filter is a map over
  * n·k rows and the closure runs on the surviving sliver.
  */
object GraphDedup {

  /** Cluster `corpus` (vec_id, embedding) by transitive cosine
    * near-duplication at `threshold`, with pair evidence from the
    * NN-descent top-k graph. Output (vec_id, canonical_id, keep) —
    * canonical = min vec_id per component, the shared dedup contract.
    */
  def clusters(corpus: DataFrame, threshold: Double, k: Int = 10,
               maxRounds: Int = 6, convergedFrac: Double = 0.01,
               seed: Long = 42L, overbuild: Int = 2): DataFrame =
    clustersFromGraph(corpus,
      NnDescent.build(corpus, k, maxRounds, convergedFrac, seed, overbuild),
      threshold)

  /** Same clustering from an ALREADY-BUILT graph (vec_id, n_id, sim)
    * — the build-once/serve-forever path: one persisted NN-descent
    * artifact ([[IndexStore.loadKnn]]) feeds ANN serving
    * ([[GraphSearch]]) and dedup alike, and re-clustering at a new
    * threshold costs only the output-sized closure, never a rebuild.
    */
  def clustersFromGraph(corpus: DataFrame, graph: DataFrame,
                        threshold: Double): DataFrame = {
    val edges = graph.filter(col("sim") >= threshold)
      .select(col("vec_id").as("d1"), col("n_id").as("d2"))
    graft.dedup.Dedup.clusters(corpus, col("vec_id"), edges)
      .withColumnRenamed("doc_id", "vec_id")
  }
}
