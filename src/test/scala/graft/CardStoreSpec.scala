package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch
import graft.text.{CardStore, DatasetCard}

/** The incremental dataset card: the parts-assembled card equals the
  * one-shot card on every exact member, the HLL member is bit-equal
  * to a one-shot sketch (and near the exact count), the percentile
  * members equal the one-shot 7i4 sketch, assembly is
  * batching-invariant, and compaction folds the parts to one with the
  * card bit-identical. */
class CardStoreSpec extends SparkSpec {
  import spark.implicits._

  private val exactCols = Seq("n_docs", "n_tokens", "n_chars", "keep_rate",
    "en_tokens", "zh_tokens", "de_tokens", "es_tokens", "fr_tokens",
    "other_tokens", "m", "tok_p50", "tok_p95")

  private def store(nBatches: Int): String = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("card_store").toString
    (0 until nBatches).foreach(i => CardStore.append(
      docs.filter(pmod(col("doc_id"), lit(nBatches)) === i),
      col("doc_id"), col("text"), col("lang"), dir))
    dir
  }

  test("parts-assembled card == one-shot card on every member; " +
      "batching-invariant; compaction bit-identical") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = store(3)
    val got = CardStore.card(spark, dir).head()
    assert(got.getAs[Long]("n_parts") === 3L)

    // exact members: equal to the ONE-SHOT card (sums of sums)
    val want = DatasetCard.card(docs, col("doc_id"), col("text"),
      col("lang")).head()
    for (c <- Seq("n_docs", "n_tokens", "n_chars", "keep_rate", "en_tokens",
        "zh_tokens", "de_tokens", "es_tokens", "fr_tokens", "other_tokens"))
      assert(got.getAs[Any](c) === want.getAs[Any](c), c)

    // HLL member: an ESTIMATE by contract — pinned within the standard
    // error of the exact distinct count. (No one-shot bit parity here:
    // a stream-built sketch estimates via HIP, a union via the
    // composite estimator — the 7i2 bit-parity claim is union-path vs
    // union-path, which the re-assembly and compaction asserts below
    // cover.)
    val est = got.getAs[Long]("n_distinct_texts_approx")
    val exact = docs.select("text").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"hll $est vs exact $exact")

    // percentile members: equal to the one-shot 7i4 sketch estimate
    val lens = docs.select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("double").as("_tok"))
    val oneQsk = QuantileSketch.estimate(
      QuantileSketch.sketchBy(lens, Nil, col("doc_id"), col("_tok"), 64),
      Nil, 64, Seq(50, 95)).head()
    assert(got.getAs[Int]("m") === oneQsk.getAs[Int]("m"))
    assert(got.getAs[Double]("tok_p50") === oneQsk.getAs[Double]("p50"))
    assert(got.getAs[Double]("tok_p95") === oneQsk.getAs[Double]("p95"))

    // batching invariance: a 2-batch store assembles the same card on
    // every EXACT member and the semilattice percentile members (the
    // HLL estimate is only bound-pinned — union-gadget state may
    // legitimately differ across part boundaries)
    val dir2 = store(2)
    val got2 = CardStore.card(spark, dir2).head()
    for (c <- exactCols)
      assert(got.getAs[Any](c) === got2.getAs[Any](c), c)
    assert(math.abs(got2.getAs[Long]("n_distinct_texts_approx") - exact)
      .toDouble / exact < 0.05)

    // compaction folds to ONE part with the card bit-identical
    CardStore.compact(spark, dir)
    assert(spark.read.parquet(dir).inputFiles.length === 1)
    val gotC = CardStore.card(spark, dir).head()
    assert(gotC.getAs[Long]("n_parts") === 1L)
    for (c <- exactCols :+ "n_distinct_texts_approx" :+ "dup_ratio_approx")
      assert(got.getAs[Any](c) === gotC.getAs[Any](c), c)
    // a later batch appends onto the compacted store and the chain
    // keeps composing (the indefinitely-composable artifact claim)
    val extra = Seq((900001L, "the quick brown fox jumps over the lazy dog",
      "en", "s1")).toDF("doc_id", "text", "lang", "source")
    CardStore.append(extra, col("doc_id"), col("text"), col("lang"), dir)
    val gotE = CardStore.card(spark, dir).head()
    assert(gotE.getAs[Long]("n_docs") === got.getAs[Long]("n_docs") + 1)
    assert(gotE.getAs[Long]("n_tokens") === got.getAs[Long]("n_tokens") + 9)
  }

test("compaction crash injection: the journal root survives the fold and " +
      "every kill window recovers the exact part set") {
    val dir = store(3)
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
    val want = CardStore.card(spark, dir).head()
    val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parts = hfs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.getName).toSeq

    // kill window 1: the folded part is half-written, nothing deleted
    intercept[RuntimeException] {
      graft.sources.CommitLog.rewriting(spark, dir, parts) {
        val half = hfs.create(new org.apache.hadoop.fs.Path(dir,
          "part-fold-half.snappy.parquet"), true)
        half.write(Array[Byte](9, 9, 9)); half.close()
        throw new RuntimeException("simulated crash mid-fold-write")
      }
    }
    graft.sources.CommitLog.recover(spark, dir)
    assert(census() == before, "window 1 must roll back byte-exactly")

    // kill window 2: the fold landed and the old parts are ALREADY
    // DELETED — the window the r13 whole-table overwrite could not
    // survive (it deleted dir/_ledger itself before writing)
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
    assert(census() == before, "window 2 must restore the retired parts")
    assert(CardStore.card(spark, dir).head().toSeq == want.toSeq)

    // the real compaction completes: card identical, one data file,
    // and the journal root is STILL THERE (the r13 flaw deleted it)
    CardStore.compact(spark, dir)
    assert(CardStore.card(spark, dir).head().getAs[Long]("n_docs")
      == want.getAs[Long]("n_docs"))
    assert(spark.read.parquet(dir).inputFiles.length == 1)
    assert(hfs.exists(new org.apache.hadoop.fs.Path(dir, "_ledger")),
      "compaction must never take the journal root down with the data")
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(dir, "_ledger/maint.pre")))
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(dir, "_ledger/maint.undo")))
  }
}
