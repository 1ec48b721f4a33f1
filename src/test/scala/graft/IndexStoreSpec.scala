package graft

import org.apache.spark.sql.functions._
import graft.vector.{IndexStore, IvfAnn, PqAnn}

class IndexStoreSpec extends SparkSpec {

  private val dir = "/tmp/graft_test_index"

  test("IVF round-trip: queries over the loaded index equal the fresh index exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val (assigned, cents) = IvfAnn.quantize(emb, nlist = 8)
    val fresh = IvfAnn.topKWith(assigned, cents, emb, queries, 5, nprobe = 3)
      .collect().map(_.toSeq).toSet
    IndexStore.saveIvf(dir, emb, assigned, cents)
    val (a2, c2, corpus2) = IndexStore.loadIvf(spark, dir)
    val loaded = IvfAnn.topKWith(a2, c2, corpus2, queries, 5, nprobe = 3)
      .collect().map(_.toSeq).toSet
    assert(loaded == fresh, "loaded-index results diverged from the fresh index")
  }

  test("cell filters on the loaded vector table prune partitions") {
    val (a2, _, _) = IndexStore.loadIvf(spark, dir)
    val plan = a2.filter(col("cell").isin(1, 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("cell#") || plan.contains("cell IN")),
      s"expected partition pruning on cell:\n${plan.take(1200)}")
    // and the pruned read returns only those cells
    val cells = a2.filter(col("cell").isin(1, 3))
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(Set(1, 3)))
  }

  test("reader isolation: a loaded index keeps serving its generation " +
      "through a re-save; retirement reclaims the superseded save") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val d = java.nio.file.Files.createTempDirectory("idx_iso").toString
    val (assigned, cents) = IvfAnn.quantize(emb, nlist = 8)
    IndexStore.saveIvf(d, emb, assigned, cents)
    val (a1, c1, v1) = IndexStore.loadIvf(spark, d) // resolved NOW
    val want = IvfAnn.topKWith(a1, c1, v1, queries, 5, nprobe = 3)
      .collect().map(_.toSeq).toSet
    // a rebuild with a DIFFERENT quantizer publishes a new generation
    // under the live reader
    val (assigned2, cents2) = IvfAnn.quantize(emb, nlist = 4)
    IndexStore.saveIvf(d, emb, assigned2, cents2)
    assert(IvfAnn.topKWith(a1, c1, v1, queries, 5, nprobe = 3)
      .collect().map(_.toSeq).toSet == want,
      "the in-flight reader must keep serving its pre-rebuild generation")
    // the new generation serves the new quantizer's answer
    val (a2, c2, v2) = IndexStore.loadIvf(spark, d)
    val fresh2 = IvfAnn.topKWith(assigned2, cents2, emb, queries, 5, nprobe = 3)
      .collect().map(_.toSeq).toSet
    assert(IvfAnn.topKWith(a2, c2, v2, queries, 5, nprobe = 3)
      .collect().map(_.toSeq).toSet == fresh2)
    // tight retirement reclaims the superseded save's subtree
    IndexStore.retire(spark, d, keepGenerations = 1)
    val partDirs = new java.io.File(d, "parts").listFiles().map(_.getName)
    assert(partDirs.count(_.startsWith("vectors_")) == 1,
      s"superseded vector saves must be reclaimed; got ${partDirs.toSeq}")
    assert(IvfAnn.topKWith(a2, c2, v2, queries, 5, nprobe = 3)
      .collect().map(_.toSeq).toSet == fresh2)
  }

  test("AS-OF loads: a pinned pre-rebuild generation serves the OLD " +
      "quantizer's answer (vectors + centroids from one generation); " +
      "retired and never-committed generations throw") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val d = java.nio.file.Files.createTempDirectory("idx_asof").toString
    val (assigned, cents) = IvfAnn.quantize(emb, nlist = 8)
    IndexStore.saveIvf(d, emb, assigned, cents)
    val want = IvfAnn.topKWith(assigned, cents, emb, queries, 5, nprobe = 3)
      .collect().map(_.toSeq).toSet
    val (assigned2, cents2) = IvfAnn.quantize(emb, nlist = 4)
    IndexStore.saveIvf(d, emb, assigned2, cents2)
    // AS OF 1 = the 8-cell index, quantizer and cells in lockstep
    val (a1, c1, v1) = IndexStore.loadIvf(spark, d, asOf = Some(1L))
    assert(IvfAnn.topKWith(a1, c1, v1, queries, 5, nprobe = 3)
      .collect().map(_.toSeq).toSet == want,
      "the pinned pre-rebuild generation must serve the old answer")
    // the K-NN tables ride the same store: a re-save with a different
    // k keeps the pre-rebuild (graph, k) pair resolvable AS OF its gen
    import spark.implicits._
    val g1 = Seq((1L, 0, 2L, 0.9)).toDF("vec_id", "rank", "n_id", "sim")
    IndexStore.saveKnn(d, g1, k = 1)
    IndexStore.saveKnn(d,
      g1.unionByName(Seq((1L, 1, 3L, 0.8)).toDF("vec_id", "rank", "n_id", "sim")),
      k = 2)
    val (gOld, kOld) = IndexStore.loadKnn(spark, d, asOf = Some(3L))
    assert(kOld === 1 && gOld.count() === 1L,
      "AS OF the first save must see its graph AND its k")
    assert(IndexStore.loadKnn(spark, d)._2 === 2)
    IndexStore.retire(spark, d, keepGenerations = 1)
    intercept[Exception] { IndexStore.loadIvf(spark, d, asOf = Some(1L)) }
    intercept[IllegalArgumentException] {
      IndexStore.loadIvf(spark, d, asOf = Some(99L))
    }
  }

  test("PQ round-trip: ADC + re-rank over loaded artifacts equals the fresh pipeline") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val (assigned, cents) = IvfAnn.quantize(emb, nlist = 8)
    val book = PqAnn.train(emb, dim = 64, m = 8, ksub = 16)
    val encoded = PqAnn.encode(emb, PqAnn.collectBook(book), dim = 64)
    val fresh = PqAnn.topKWith(assigned, cents, encoded, PqAnn.collectBook(book),
        emb, queries, 5, dim = 64, nprobe = 4, rerank = 8)
      .collect().map(_.toSeq).toSet
    IndexStore.savePq(dir, book, encoded)
    val (book2, enc2) = IndexStore.loadPq(spark, dir)
    val loaded = PqAnn.topKWith(assigned, cents, enc2, PqAnn.collectBook(book2),
        emb, queries, 5, dim = 64, nprobe = 4, rerank = 8)
      .collect().map(_.toSeq).toSet
    assert(loaded == fresh, "loaded PQ artifacts diverged from fresh")
  }
}
