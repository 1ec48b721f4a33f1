package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore
import graft.text.{LmStore, TextFeatures}

/** The LM store's snapshot isolation (the store publishes through the
  * MVCC manifest — the engine's one store protocol): bit-parity with
  * the direct operator, plus a model resolved before maintenance
  * serving its generation while compaction and grace-window
  * retirement run. */
class LmStoreSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  private def scored(m: graft.functions.BigramModel) =
    LmStore.score(docs, col("doc_id"), col("text"), m)
      .as[(Long, Long, Double)].collect().toSet

  test("store == direct operator; an in-flight reader survives " +
      "compaction and retirement; serving bit-exact throughout") {
    val dir = java.nio.file.Files.createTempDirectory("lmsnap").toString
    Seq(0, 1, 2).foreach { i =>
      LmStore.append(docs.filter(pmod(col("doc_id"), lit(3)) === i),
        col("text"), dir)
    }
    val want = TextFeatures.charBigramEntropy(docs, col("doc_id"),
      col("text")).as[(Long, Long, Double)].collect().toSet
    assert(scored(LmStore.model(spark, dir)) == want)
    assert(SnapshotStore.currentGen(spark, dir) === 3L)

    // an in-flight READER'S generation survives maintenance: resolve
    // the parts frame now, compact + retire within grace, then build
    // the model from the OLD resolution
    val oldParts = SnapshotStore.read(spark, dir)
    LmStore.compact(spark, dir)
    SnapshotStore.retire(spark, dir, keepGenerations = 2)
    assert(scored(LmStore.model(spark, dir)) == want,
      "the folded generation must serve identically")
    val oldModel = oldParts.groupBy("bg").agg(sum(col("c")).as("c")).collect()
    assert(oldModel.nonEmpty,
      "the pre-compaction reader must still resolve its file set")

    // tight retirement reclaims to the folded part; serving unchanged
    SnapshotStore.retire(spark, dir, keepGenerations = 1)
    assert(new java.io.File(dir, "parts").listFiles().length === 1)
    assert(scored(LmStore.model(spark, dir)) == want)

    // the chain keeps composing: append onto the compacted store, and
    // the model equals a one-shot train over the extended corpus
    val extra = Seq((900001L, "aa bb aa")).toDF("doc_id", "text")
    LmStore.append(extra, col("text"), dir)
    val corpus = docs.select("doc_id", "text").unionByName(extra)
    val wantExt = TextFeatures.charBigramEntropy(corpus,
        col("doc_id"), col("text")).as[(Long, Long, Double)].collect().toSet
    val gotExt = LmStore.score(corpus, col("doc_id"),
        col("text"), LmStore.model(spark, dir))
      .as[(Long, Long, Double)].collect().toSet
    assert(gotExt == wantExt,
      "post-compaction appends must keep one-shot parity")
  }

  test("AS-OF model: the pre-append generation IS the model trained " +
      "without that batch; pre-compaction == compacted bit-equal; " +
      "retired and never-committed generations throw") {
    val dir = java.nio.file.Files.createTempDirectory("lmsnap_asof").toString
    LmStore.append(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      col("text"), dir)
    val wantPre = scored(LmStore.model(spark, dir))
    LmStore.append(docs.filter(pmod(col("doc_id"), lit(2)) === 1),
      col("text"), dir)
    val wantFull = scored(LmStore.model(spark, dir))
    assert(wantFull != wantPre, "the append must change the model")
    // counts are additive, so AS OF 1 == the half-corpus model exactly
    assert(scored(LmStore.model(spark, dir, asOfGen = 1L)) == wantPre)
    // a compaction folds to gen 3; AS OF 2 serves bit-identically
    LmStore.compact(spark, dir)
    assert(scored(LmStore.model(spark, dir, asOfGen = 2L)) == wantFull)
    assert(scored(LmStore.model(spark, dir)) == wantFull)
    // past the grace window the pinned generation is gone; a
    // generation that never committed is refused outright
    SnapshotStore.retire(spark, dir, keepGenerations = 1)
    intercept[Exception] { LmStore.model(spark, dir, asOfGen = 1L) }
    intercept[IllegalArgumentException] {
      LmStore.model(spark, dir, asOfGen = 99L)
    }
    assert(scored(LmStore.model(spark, dir)) == wantFull)
  }
}
