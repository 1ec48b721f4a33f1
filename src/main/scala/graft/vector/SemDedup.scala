package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
  * deduplication over an embedding column — k-means cells scope the
  * pair search, exact cosine scores within-cell pairs, and connected
  * components pick one canonical vector per semantic-duplicate group.
  * This is the embedding-space analogue of the text near-dup chain
  * (pairs -> clusters -> keep), catching paraphrase-grade duplicates
  * that share no n-grams, which every lexical generator misses.
  *
  * Scale shape: the coarse quantizer is shared with IVF ANN
  * ([[IvfAnn.quantize]] — bounded training sample, broadcast-sized
  * model, same session cache), and each vector is assigned to its
  * `nprobe` nearest cells MAP-SIDE: the nlist centroids are collected
  * (driver-bounded, nlist x dim floats — the same artifact IvfAnn
  * already holds on the driver) and scored per row as a codegen'd
  * literal-array dot product, top-nprobe picked with array_sort +
  * slice — no shuffle, no window. Multi-probing is the recall lever
  * the paper's single-assignment lacks: a pair split by a cell
  * boundary still co-occurs in a probed cell unless BOTH vectors rank
  * the other's cell below nprobe. Candidate volume is
  * nprobe^2-bounded per the usual IVF accounting, never all-pairs;
  * per-cell cost is (n·nprobe/nlist)^2·nlist, with `nlist` the
  * quadratic-term cap that grows with the corpus (the paper runs 100k
  * cells over LAION). The keep-list closure reuses the O(log n)
  * component machinery.
  */
object SemDedup {

  /** Semantic-duplicate pairs (d1, d2, sim), d1 < d2, exact cosine
    * >= threshold, found within shared probed cells. `cacheKey`
    * reuses a quantizer trained earlier in the session for the same
    * corpus identity (e.g. the IVF ANN index). nlist must be >= 2. */
  def pairs(vecs: DataFrame, nlist: Int, threshold: Double,
            nprobe: Int = 2, cacheKey: Option[String] = None): DataFrame = {
    require(nlist >= 2 && nprobe >= 1 && nprobe <= nlist)
    // ONE persisted narrow base of the producer subtree: the
    // quantizer training pass, the assignment scan and both
    // score-join sides all derive from this cache, so an expensive
    // `vecs` producer (a parsing ingest, an upstream join) is
    // evaluated exactly once however many consumers follow
    val base = vecs.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (_, cents) = cacheKey match {
      case Some(k) => IvfAnn.quantizeCached(k, base, nlist)
      case None    => IvfAnn.quantize(base, nlist)
    }
    // the release arms only AFTER quantizer training returns: KMeans
    // fit runs its own executions over the base lineage, and a
    // one-use listener registered before training would release the
    // cache on the first training pass — before the assignment scan
    // and both score-join sides read it (the r10 advice). The one
    // remaining base-reading execution is the caller's action: the
    // assignment scan and both score joins are subtrees of the ONE
    // returned plan, and an execution counts once however many times
    // the cached subtree appears in it.
    graft.functions.CacheRelease.afterNextExecution(base)
    // nlist x (dim floats + norm2) — the driver-bounded model artifact
    val centRows = cents.select(col("cell"), col("c_emb"), col("c_norm2"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    // argmin_j |x - c_j|^2 = argmin_j |c_j|^2 - 2 x.c_j (|x|^2 constant
    // per row) — same geometry KMeans assigns with, so nprobe = 1
    // reproduces the quantizer's own assignment
    val scored: Column = array(centRows.map { case (cell, emb, n2) =>
      struct(
        (lit(n2) - lit(2.0) * Similarity.dot(col("embedding"),
          typedlit(emb))).as("s"),
        lit(cell).as("c"))
    }.toIndexedSeq: _*)
    // two-phase candidate pattern (the Interaction/MinHash shape):
    // phase 1 self-joins the NARROW assignment — the embeddings never
    // enter the pair-grain exchange, so a pair sharing several probed
    // cells costs slim id rows, not repeated 4·dim-byte vector rows
    // (at nprobe = nlist every pair meets in every cell: an nlist×
    // blowup the wide join would pay in full) — and phase 2 joins
    // embeddings back to score each candidate pair exactly once.
    //
    // Pair UNIQUENESS (r17): when nlist fits a 64-bit set, each side
    // carries its probed cells as a BITMASK and a pair is emitted only
    // from its MINIMUM shared cell — `shared & (2^cell - 1) == 0`,
    // three codegen'd integer ops on the join output — so the
    // duplicate-heavy candidate set never enters a dedup exchange (the
    // r16 plan shuffled the multiply-witnessed candidates into a
    // distinct(); at nprobe = nlist that exchange carried every pair
    // nlist times). An earlier r17 cut expressed the same witness as
    // array_min(array_intersect(probes_a, probes_b)) — per-row array
    // allocation on the pair-grain join output, measured 7x SLOWER
    // than the distinct it replaced; the bitmask form is the same
    // predicate at integer-op cost. Wider-than-64 nlist deployments
    // keep the distinct (their duplication factor is nprobe/nlist —
    // tiny — so the dedup exchange is candidate-sized, not blown up).
    // Persisted: assignment feeds both self-join sides (the
    // jaccardPairs persist-shared-subtrees rule); both caches release
    // after the caller's action.
    val maskable = nlist <= 62
    val probed = base
      .withColumn("_probe", slice(array_sort(scored), 1, nprobe))
      .withColumn("cell", explode(transform(col("_probe"), p => p("c"))))
    val assigned = (if (maskable) probed.withColumn("mask",
        aggregate(col("_probe"), lit(0L), (acc, p) =>
          acc.bitwiseOR(call_function("shiftleft", lit(1L), p("c")))))
        .select(col("cell"), col("vec_id"), col("mask"))
      else probed.select(col("cell"), col("vec_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.functions.CacheRelease.afterNextExecution(assigned)
    val joined = assigned.as("a").join(assigned.as("b"),
      col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
    val cand =
      if (maskable) joined
        .filter((col("a.mask").bitwiseAND(col("b.mask"))
          .bitwiseAND(call_function("shiftleft", lit(1L), col("a.cell")) - 1))
          === 0L)
        .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
      else joined
        .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
        .distinct()
    // derived from the persisted base — a map over the cache, so no
    // second persist (the per-row norm recompute is cheap; a second
    // cache of the same embeddings would not be)
    val v = base.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    cand
      .join(v.select(col("vec_id").as("d1"), col("embedding").as("_e1"),
        col("nrm").as("_n1")), Seq("d1"))
      .join(v.select(col("vec_id").as("d2"), col("embedding").as("_e2"),
        col("nrm").as("_n2")), Seq("d2"))
      .withColumn("sim",
        Similarity.dot(col("_e1"), col("_e2")) / (col("_n1") * col("_n2")))
      .filter(col("sim") >= threshold)
      .select(col("d1"), col("d2"), col("sim"))
  }

  /** Canonical keep-list: (vec_id, canonical_id, keep) with one kept
    * vector (min id) per semantic-duplicate component. */
  def keepList(vecs: DataFrame, nlist: Int, threshold: Double,
               nprobe: Int = 2, cacheKey: Option[String] = None): DataFrame =
    graft.dedup.Dedup.clusters(vecs, col("vec_id"),
        pairs(vecs, nlist, threshold, nprobe, cacheKey))
      .withColumnRenamed("doc_id", "vec_id")
}
