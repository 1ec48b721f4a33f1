package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Bm25Stream
import graft.text.{Bm25, Bm25Index}

/** Streaming BM25 maintenance: the index tracks the feed (serving ==
  * the direct query over everything ingested, bit-identical), and a
  * replayed completed batch is ledger-skipped instead of
  * double-appended into the postings and corpus stats, and a crash
  * mid-apply (including between the postings and meta writes) is
  * rolled back by the commit journal to the exact committed file
  * set. */
class Bm25StreamSpec extends SparkSpec {
  import spark.implicits._

  private val queries = Seq(1 -> "hash join", 2 -> "window agg")

  /** (relative path, size) of every data file under `dir`, the commit
    * ledger excluded — the byte-census the recovery contract pins. */
  private def fileCensus(dir: String): Set[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => (root.relativize(p).toString, java.nio.file.Files.size(p)))
      .filterNot(_._1.startsWith("_ledger"))
      .toSet
  }

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

  test("crash injection: a kill between the postings and meta writes is " +
      "rolled back to the exact committed file set, then the replay lands") {
    val docs = Tables.load(spark, sfDir, "documents")
    val base = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("bm25_crash").toString
    Bm25Index.build(base, col("doc_id"), col("text"), dir, nBuckets = 8)
    def served() = Bm25Index.topK(spark, dir, queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    val want = served()
    val committedCensus = fileCensus(dir)
    val batch = Seq((900001L, "hash join hash join")).toDF("doc_id", "text")

    // kill BETWEEN the two writes: run the real append, then put the
    // store into the exact between-writes state (postings parts on
    // disk, meta part not) and die before the commit marker
    val metaBefore = spark.read.parquet(s"$dir/meta").inputFiles.toSet
    val boom = intercept[RuntimeException] {
      graft.sources.CommitLog.atomically(spark, dir, 42L) {
        Bm25Index.append(batch, col("doc_id"), col("text"), dir)
        // delete through the Hadoop FS, as a real kill would leave it
        // (the checksum sidecar travels with its file)
        val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        spark.read.parquet(s"$dir/meta").inputFiles.toSet.diff(metaBefore)
          .foreach(f => hfs.delete(new org.apache.hadoop.fs.Path(f), false))
        throw new RuntimeException("simulated crash")
      }
    }
    assert(boom.getMessage == "simulated crash")
    assert(fileCensus(dir) != committedCensus, "the store must be torn")

    // recovery restores the committed file set byte-for-byte; serving
    // is the pre-batch answer again
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == committedCensus)
    assert(served() == want)

    // the stream replays the batch (its checkpoint never committed):
    // the same batch id now applies cleanly and serving extends
    Bm25Stream.maintainBatch(dir)(batch, 42L)
    val want2 = Bm25.topK(
        base.select("doc_id", "text").unionByName(batch),
        col("doc_id"), col("text"), queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    assert(served() == want2)

    // a kill AFTER both writes but before the marker (the widest torn
    // span, write-job _temporary debris included) also rolls back
    val committed2 = fileCensus(dir)
    val batch2 = Seq((900002L, "window agg window")).toDF("doc_id", "text")
    intercept[RuntimeException] {
      graft.sources.CommitLog.atomically(spark, dir, 43L) {
        Bm25Index.append(batch2, col("doc_id"), col("text"), dir)
        val junk = java.nio.file.Paths.get(dir, "postings", "_temporary", "x")
        java.nio.file.Files.createDirectories(junk.getParent)
        java.nio.file.Files.write(junk, Array[Byte](1))
        throw new RuntimeException("simulated crash")
      }
    }
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == committed2)
    assert(served() == want2)
    // recovery is idempotent and a clean store is a no-op
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == committed2)
  }
}
