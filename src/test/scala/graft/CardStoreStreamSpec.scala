package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.CardStoreStream
import graft.text.{CardStore, DatasetCard}

/** Streaming card-store maintenance: the maintained release card
  * equals the one-shot card over everything ingested, a replayed
  * completed batch cannot double the additive masses, and an unseen
  * batch extends the card. */
class CardStoreStreamSpec extends SparkSpec {
  import spark.implicits._

  test("maintained card == one-shot card over everything ingested; " +
      "replay is a no-op; an unseen batch extends") {
    implicit val sql = spark.sqlContext
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("card_stream").toString
    val feed = docs.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSeq
    val stream = MemoryStream[(Long, String, String)]
    val q = CardStoreStream.maintain(
      stream.toDF().toDF("doc_id", "text", "lang"), dir, s"$dir/_ckpt")
    try feed.grouped(math.max(1, feed.size / 3)).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    } finally q.stop()

    val exactCols = Seq("n_docs", "n_tokens", "n_chars", "keep_rate",
      "en_tokens", "zh_tokens", "de_tokens", "es_tokens", "fr_tokens",
      "other_tokens", "m", "tok_p50", "tok_p95")
    def got() = CardStore.card(spark, dir).head()
    val want = DatasetCard.card(docs, col("doc_id"), col("text"),
      col("lang")).head()
    for (c <- Seq("n_docs", "n_tokens", "n_chars", "keep_rate", "en_tokens",
        "zh_tokens", "de_tokens", "es_tokens", "fr_tokens", "other_tokens"))
      assert(got().getAs[Any](c) === want.getAs[Any](c), c)

    // a replayed COMPLETED batch is skipped — the additive masses (the
    // non-idempotent part) are untouched
    val before = exactCols.map(c => got().getAs[Any](c))
    CardStoreStream.maintainBatch(dir)(
      feed.take(3).toDF("doc_id", "text", "lang"), 0L)
    assert(exactCols.map(c => got().getAs[Any](c)) === before)
    // the LOST-MARKER face: a batch published (src_batch committed)
    // by a run that died before writing its marker is probed via the
    // committed max src_batch — marked and skipped, never double-summed
    CardStoreStream.maintainBatch(dir)(
      Seq((900001L, "the quick brown fox jumps over the lazy dog", "en"))
        .toDF("doc_id", "text", "lang"), 99L)
    assert(got().getAs[Long]("n_docs") === want.getAs[Long]("n_docs") + 1)
    assert(got().getAs[Long]("n_tokens") === want.getAs[Long]("n_tokens") + 9)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, "_ledger/batch.99")
    assert(fs.exists(marker))
    assert(fs.delete(marker, false)) // simulate dying before the marker
    CardStoreStream.maintainBatch(dir)(
      Seq((900001L, "the quick brown fox jumps over the lazy dog", "en"))
        .toDF("doc_id", "text", "lang"), 99L)
    assert(got().getAs[Long]("n_docs") === want.getAs[Long]("n_docs") + 1,
      "a published-but-unmarked batch must not double the masses")
    assert(fs.exists(marker), "the gate must re-commit the lost marker")

    // an unseen batch id still applies after the gate
    CardStoreStream.maintainBatch(dir)(
      Seq((900002L, "another tiny document", "en"))
        .toDF("doc_id", "text", "lang"), 100L)
    assert(got().getAs[Long]("n_docs") === want.getAs[Long]("n_docs") + 2)
  }
}
