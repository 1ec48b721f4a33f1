package graft

import org.apache.spark.sql.functions._

import graft.text.{LmStore, TextFeatures}

/** Incremental LM artifacts: the summed batch parts reproduce the
  * one-shot model bit-for-bit (scores identical to the direct
  * operators), batching is irrelevant, compaction preserves serving,
  * and held-out docs ride the smoothed unseen floor exactly like the
  * cross-corpus operator. */
class LmStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  private def scored(dir: String, df: org.apache.spark.sql.DataFrame) =
    LmStore.score(df, col("doc_id"), col("text"), LmStore.model(spark, dir))
      .as[(Long, Long, Double)].collect().toSet

  test("artifact scoring equals the direct self-trained operator; batching is irrelevant") {
    val d3 = java.nio.file.Files.createTempDirectory("lm3").toString
    Seq(0, 1, 2).foreach(i => LmStore.append(
      docs.filter(pmod(col("doc_id"), lit(3)) === i), col("text"), d3))
    val d2 = java.nio.file.Files.createTempDirectory("lm2").toString
    Seq(0, 1).foreach(i => LmStore.append(
      docs.filter(pmod(col("doc_id"), lit(2)) === i), col("text"), d2))
    val want = TextFeatures.charBigramEntropy(docs, col("doc_id"),
      col("text")).as[(Long, Long, Double)].collect().toSet
    assert(scored(d3, docs) == want)
    assert(scored(d2, docs) == want) // a different batching, same model
    assert(want.nonEmpty)
  }

  test("compaction folds parts; serving bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("lmc").toString
    Seq(0, 1, 2).foreach(i => LmStore.append(
      docs.filter(pmod(col("doc_id"), lit(3)) === i), col("text"), dir))
    assert(spark.read.parquet(dir).inputFiles.length == 3)
    val before = scored(dir, docs)
    LmStore.compact(spark, dir)
    assert(spark.read.parquet(dir).inputFiles.length == 1)
    assert(scored(dir, docs) == before)
  }

  test("held-out docs hit the smoothed floor exactly as the cross-corpus operator") {
    val ref = docs.filter(col("doc_id") % 11 === 0)
    val rest = docs.filter(col("doc_id") % 11 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("lmx").toString
    LmStore.append(ref, col("text"), dir)
    val want = TextFeatures.charBigramEntropyAgainst(ref, col("text"),
        rest, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().toSet
    assert(scored(dir, rest) == want)
    assert(want.nonEmpty)
  }

test("compaction crash injection: a kill after the old parts are retired " +
      "recovers the model byte-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("lmcrash").toString
    Seq(0, 1, 2).foreach(i => LmStore.append(
      docs.filter(pmod(col("doc_id"), lit(3)) === i), col("text"), dir))
    val want = scored(dir, docs)
    def census(): Set[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => (root.relativize(p).toString, java.nio.file.Files.size(p)))
        .filterNot(_._1.startsWith("_ledger"))
        .toSet
    }
    val before = census()
    val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parts = hfs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.getName).toSeq
    // the worst window of the append-then-retire sequence: new fold
    // present, EVERY old part already deleted, then the process dies —
    // under the r13 whole-table overwrite this window had destroyed
    // the journal root itself
    intercept[RuntimeException] {
      graft.sources.CommitLog.rewriting(spark, dir, parts) {
        val fold = hfs.create(new org.apache.hadoop.fs.Path(dir,
          "part-fold-new.snappy.parquet"), true)
        fold.write(Array[Byte](7, 7, 7)); fold.close()
        parts.foreach(f =>
          hfs.delete(new org.apache.hadoop.fs.Path(dir, f), false))
        throw new RuntimeException("simulated crash mid-retire")
      }
    }
    graft.sources.CommitLog.recover(spark, dir)
    assert(census() == before, "recover must restore the retired parts")
    assert(scored(dir, docs) == want)
    // the real compaction still completes and serves identically,
    // with the journal root intact
    LmStore.compact(spark, dir)
    assert(scored(dir, docs) == want)
    assert(hfs.exists(new org.apache.hadoop.fs.Path(dir, "_ledger")))
  }
}
