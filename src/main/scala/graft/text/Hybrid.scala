package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Numeric

/** Hybrid retrieval rank fusion — the production pattern that merges
  * a SPARSE ranker (BM25 keyword relevance) with a DENSE ranker
  * (embedding cosine) into one ranked list per query, via Reciprocal
  * Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  * `score(d) = Σ_systems 1/(k0 + rank_sys(d))`, summing only over
  * the systems that ranked `d`. RRF needs no score calibration
  * between systems — only ranks — which is exactly why it is the
  * default fusion in mixed lexical/vector stacks.
  *
  * Scale shape: the inputs are already top-k ranked lists, i.e.
  * `|queries|·k`-sized slivers regardless of corpus size — fusion
  * cost is independent of the corpus. The union + one (query, doc)
  * aggregate + one per-query window run entirely on those slivers;
  * the expensive work stays in the upstream rankers ([[Bm25.topK]]
  * scales by broadcast-filtered postings, the dense side by whichever
  * ANN member fits — brute/IVF/PQ/graph all emit this same
  * (query_id, doc_id, rank) surface).
  *
  * Parity contract: `1/(k0+rank)` is one IEEE division on exact
  * integers, reproducible anywhere; the per-doc sum goes through
  * [[Numeric.dsum]] at scale 8 so it is order-independent; the fused
  * rank breaks ties on (score desc, doc_id); output rounds via
  * [[Numeric.cround]].
  */
object Hybrid {

  /** Fuse ranked lists — each (query_id, doc_id, rank) — into
    * (query_id, doc_id, rrf_score, rank), top `k` per query. */
  def rrf(ranked: Seq[DataFrame], k: Int = 10, k0: Int = 60): DataFrame = {
    require(ranked.nonEmpty, "need at least one ranked list")
    val contrib = ranked
      .map(_.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(k0) + col("rank").cast("double"))).as("_c")))
      .reduce(_ union _)
    val fused = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(Numeric.dsum(col("_c"), 8).as("_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        Numeric.cround(col("_score"), 6).as("rrf_score"), col("rank"))
  }
}
