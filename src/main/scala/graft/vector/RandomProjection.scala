package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Mix64, Numeric}

/** Sign-random-projection dimensionality reduction (Achlioptas 2003,
  * "Database-friendly random projections": ±1 entries satisfy the
  * Johnson-Lindenstrauss lemma) — the cheap embedding sketch between
  * full vectors and binary SimHash: project dim-D embeddings to
  * dim-`outDim` sketches that approximately preserve pairwise
  * distances, for ANN prefiltering, drift monitoring in a smaller
  * space, and shipping compact vectors to downstream stores. PCA
  * (27g) learns a data-dependent basis iteratively; the JL projection
  * is data-INDEPENDENT and deterministic, which is what makes it
  * exactly replayable — and re-runnable on any corpus slice without
  * retraining.
  *
  * Determinism/parity contract: the ±1 matrix entry for (input dim i,
  * output dim j) is `1 - 2·(Mix64(seed + i·outDim + j) mod 2)` — the
  * engine's splitmix64 finalizer, replayed bit-identically by the
  * DuckDB oracle in HUGEINT — and the per-output-dim sums ride
  * decimal(28,8) ([[Numeric.dsum]]) so the result is independent of
  * partitioning and row order. Output scales by 1/sqrt(outDim) (the
  * JL normalization) and rounds via the shared floor formula.
  *
  * Scale shape: the q_pool explode — (vec, i, v) rows cross-joined
  * with the broadcast outDim index — is a dim·outDim row
  * amplification that MAP-SIDE partial aggregation collapses to
  * n·outDim partials before the one exchange; the shuffle carries
  * sketch-grain sums, never input vectors. Output at (vec_id, j)
  * scalar grain (the q_pool convention); re-collecting to arrays is
  * a caller-side sort_array(collect_list). */
object RandomProjection {

  def project(df: DataFrame, id: Column, emb: Column, outDim: Int,
              seed: Long = 0L): DataFrame = {
    require(outDim >= 1, "outDim must be >= 1")
    val spark = df.sparkSession
    val js = spark.range(outDim).select(col("id").cast("int").as("j"))
    val sign = (lit(1) - lit(2) * pmod(
      Mix64(lit(seed) + col("i").cast("long") * outDim + col("j")),
      lit(2))).cast("double")
    // parallelism floor (r17): the Mix64-sign expansion below is the
    // expensive per-row work and plans single-task off a single-split
    // input -- see Ingest.parallelismFloor
    graft.sources.Ingest.parallelismFloor(
        df.select(id.as("vec_id"), posexplode(emb).as(Seq("i", "_v"))))
      .crossJoin(broadcast(js))
      .groupBy(col("vec_id"), col("j"))
      .agg(Numeric.cround(
        Numeric.dsum(sign * col("_v").cast("double"), 8)
          / math.sqrt(outDim.toDouble), 6).as("proj"))
  }
}
