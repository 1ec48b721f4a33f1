package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Bm25Stream
import graft.text.{Bm25, Bm25Index}

/** Streaming BM25 maintenance: the index tracks the feed (serving ==
  * the direct query over everything ingested, bit-identical), and a
  * replayed completed batch is ledger-skipped instead of
  * double-appended into the postings and corpus stats. */
class Bm25StreamSpec extends SparkSpec {
  import spark.implicits._

  private val queries = Seq(1 -> "hash join", 2 -> "window agg")

  test("maintained index serves the direct answer; completed-batch replay is a no-op") {
    implicit val sql = spark.sqlContext
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("bm25_stream").toString
    Bm25Index.build(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      col("doc_id"), col("text"), dir, nBuckets = 8)

    val feed = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val q = Bm25Stream.maintain(stream.toDF().toDF("doc_id", "text"),
      dir, s"$dir/_ckpt")
    try feed.grouped(math.max(1, feed.size / 3)).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    } finally q.stop()

    def served() = Bm25Index.topK(spark, dir, queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    val want = Bm25.topK(docs, col("doc_id"), col("text"), queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    assert(served() == want)
    assert(want.nonEmpty)

    // replaying a completed batch: postings/meta byte-census unchanged
    def census() = (
      spark.read.parquet(s"$dir/postings").inputFiles.sorted.toSeq,
      spark.read.parquet(s"$dir/meta")
        .agg(sum("n_docs"), sum("sum_dl")).head().toSeq)
    val before = census()
    Bm25Stream.maintainBatch(dir)(
      feed.take(2).toDF("doc_id", "text"), 0L) // batch 0 already applied
    assert(census() == before)
    assert(served() == want)
    // an unseen batch id applies (new docs extend the index)
    Bm25Stream.maintainBatch(dir)(
      Seq((900001L, "hash join hash join")).toDF("doc_id", "text"), 99L)
    val want2 = Bm25.topK(
        docs.select("doc_id", "text")
          .unionByName(Seq((900001L, "hash join hash join"))
            .toDF("doc_id", "text")),
        col("doc_id"), col("text"), queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    assert(served() == want2)
    assert(served() != want)
  }
}
