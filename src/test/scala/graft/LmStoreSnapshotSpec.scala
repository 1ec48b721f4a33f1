package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore
import graft.text.{LmStore, TextFeatures}

/** The snapshot-manifested LM store: bit-parity with the journaled
  * store and the direct operator, plus the isolation the manifest
  * buys — a model resolved before maintenance serves its generation
  * while compaction and grace-window retirement run. */
class LmStoreSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  private def scored(m: graft.functions.BigramModel) =
    LmStore.score(docs, col("doc_id"), col("text"), m)
      .as[(Long, Long, Double)].collect().toSet

  test("snapshot store == journaled store == direct operator; compaction " +
      "and retirement preserve serving bit-exactly") {
    val snapDir = java.nio.file.Files.createTempDirectory("lmsnap").toString
    val plainDir = java.nio.file.Files.createTempDirectory("lmplain").toString
    Seq(0, 1, 2).foreach { i =>
      val b = docs.filter(pmod(col("doc_id"), lit(3)) === i)
      LmStore.appendSnapshot(b, col("text"), snapDir)
      LmStore.append(b, col("text"), plainDir)
    }
    val want = TextFeatures.charBigramEntropy(docs, col("doc_id"),
      col("text")).as[(Long, Long, Double)].collect().toSet
    assert(scored(LmStore.modelSnapshot(spark, snapDir)) == want)
    assert(scored(LmStore.model(spark, plainDir)) == want)
    assert(SnapshotStore.currentGen(spark, snapDir) === 3L)

    // an in-flight READER'S generation survives the maintenance the
    // journaled store would have rewritten under it: resolve the parts
    // frame now, compact + retire within grace, then build the model
    // from the OLD resolution
    val oldParts = SnapshotStore.read(spark, snapDir)
    LmStore.compactSnapshot(spark, snapDir)
    SnapshotStore.retire(spark, snapDir, keepGenerations = 2)
    assert(scored(LmStore.modelSnapshot(spark, snapDir)) == want,
      "the folded generation must serve identically")
    val oldModel = oldParts.groupBy("bg").agg(sum(col("c")).as("c")).collect()
    assert(oldModel.nonEmpty,
      "the pre-compaction reader must still resolve its file set")

    // tight retirement reclaims to the folded part; serving unchanged
    SnapshotStore.retire(spark, snapDir, keepGenerations = 1)
    assert(new java.io.File(snapDir, "parts").listFiles().length === 1)
    assert(scored(LmStore.modelSnapshot(spark, snapDir)) == want)

    // the chain keeps composing: append onto the compacted snapshot
    val extra = Seq((900001L, "aa bb aa", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    LmStore.appendSnapshot(extra, col("text"), snapDir)
    LmStore.append(extra, col("text"), plainDir)
    assert(scored(LmStore.modelSnapshot(spark, snapDir)) ==
      scored(LmStore.model(spark, plainDir)),
      "snapshot and journaled stores must stay bit-identical")
  }
}
