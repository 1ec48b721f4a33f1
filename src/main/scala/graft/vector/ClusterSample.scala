package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-balanced diversity sampling — the embedding-space selection
  * step between dedup and training (DeepCore/coreset-style "cluster
  * then sample per cluster"): k-means cells partition the embedding
  * space, then an EXACT per-cell quota is kept, so dense regions stop
  * dominating the subset and sparse regions survive. The complement of
  * SemDeDup (which removes near-duplicate neighbors within a cell,
  * while this equalizes REGION mass).
  *
  * Scale shape: the cells come from the SAME cached coarse quantizer
  * the IVF index uses (one trained artifact serves search, semantic
  * dedup and sampling), and the per-cell quota is SampleK's counting
  * aggregate + boundary-bucket window — one pass, no per-cell sort,
  * nothing driver-side but the (nlist)-row centroid table. The keep
  * decision is the deterministic Lehmer key, reproducible bit-for-bit
  * on any engine or partitioning.
  */
object ClusterSample {

  /** Keep exactly min(k, |cell|) vectors per quantizer cell. Returns
    * (vec_id, cell). `corpusKey` identifies the corpus in the shared
    * quantizer cache (one index artifact per corpus per session). */
  def sample(corpusKey: String, corpus: DataFrame, nlist: Int,
             k: Int): DataFrame = {
    val (assigned, _) = IvfAnn.quantizeCached(corpusKey, corpus, nlist)
    graft.text.SampleK.sampleExactK(assigned, col("vec_id"), col("cell"), k)
      .select(col("doc_id").as("vec_id"), col("grp").as("cell"))
  }
}
