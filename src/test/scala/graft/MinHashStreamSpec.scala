package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dedup.MinHashLSH
import graft.streaming.{MinHashStream, NearDupCand, SigAt}

/** Streaming MinHash-LSH near-dup detection: candidate parity with the
  * batch generator, signature-estimate correctness, replay guard,
  * bounded star-capped state, retention expiry. */
class MinHashStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def at(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def run(batches: Seq[Seq[SigAt]], cap: Int = 64,
                  retentionSec: Long = 3600): Seq[NearDupCand] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"mh_stream_$n"
    val stream = MemoryStream[SigAt]
    val q = MinHashStream.nearDupCandidates(
        stream.toDS(), shingleK = 3, k = 64, bands = 16, cap = cap,
        retentionSec = retentionSec, watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[NearDupCand].collect().toSeq
  }

  private val near1 = "the quick brown fox jumps over the lazy dog again and again"
  private val near2 = "the quick brown fox jumps over the lazy dog again and again today"
  private val far = "completely different content about distributed query engines at scale"

  test("streamed candidates equal the batch banding candidates") {
    val docs = Seq(
      SigAt(at(1), 1L, near1), SigAt(at(2), 2L, near2),
      SigAt(at(3), 3L, far), SigAt(at(4), 4L, near1))
    val got = MinHashStream.finalizePairs(run(Seq(docs)).toDF(), 0.0)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val batch = MinHashLSH.candidatePairs(
        MinHashLSH.signatures(docs.toDF(), col("doc_id"), col("text"), 3, 64),
        bands = 16, rowsPerBand = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.contains((1L, 4L))) // the identical pair must be there
  }

  test("identical docs estimate 1.0; the estimate matches the signatures") {
    val docs = Seq(SigAt(at(1), 1L, near1), SigAt(at(2), 2L, near1),
      SigAt(at(3), 3L, near2))
    val got = MinHashStream.finalizePairs(run(Seq(docs)).toDF(), 0.0)
      .as[NearDupCand].collect().map(c => (c.d1, c.d2) -> c.est_jaccard).toMap
    assert(got((1L, 2L)) == 1.0)
    // cross-check 1-3 against the driver-side estimator on real sigs
    val sigs = MinHashLSH.signatures(docs.toDF(), col("doc_id"), col("text"), 3, 64)
      .select(col("doc_id"), col("sig")).as[(Long, Array[Long])].collect().toMap
    val exp = graft.functions.Numeric.croundD(
      MinHashStream.estJaccard(sigs(1L), sigs(3L), 64), 6)
    got.get((1L, 3L)).foreach(e => assert(e == exp))
  }

  test("a replayed doc id emits no self pair") {
    val docs = Seq(SigAt(at(1), 1L, near1), SigAt(at(2), 1L, near1))
    val got = run(Seq(docs))
    assert(!got.exists(c => c.d1 == c.d2))
    assert(got.isEmpty) // the replay is dropped, no pair at all
  }

  test("a full bucket star-caps: overflow pairs hit the first member only") {
    // cap=2: docs 1,2 stored; docs 3,4 overflow and pair with doc 1
    // only (per bucket) — connectivity preserved, state bounded
    val docs = (1L to 4L).map(i => SigAt(at(i), i, near1))
    val pairs = MinHashStream.finalizePairs(run(Seq(docs), cap = 2).toDF(), 0.0)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("state expires after the retention horizon") {
    // doc 2 arrives 100 s after doc 1 with retention 10 s: bucket
    // state expired, no pair despite identical text
    val got = run(
      Seq(Seq(SigAt(at(1), 1L, near1)), Seq(SigAt(at(101), 2L, near1)),
        Seq(SigAt(at(300), 99L, far))),
      retentionSec = 10)
    assert(!got.exists(c => c.d1 == 1L && c.d2 == 2L))
  }

  test("within the horizon the dup is caught across batches") {
    val got = run(
      Seq(Seq(SigAt(at(1), 1L, near1)), Seq(SigAt(at(30), 2L, near1))),
      retentionSec = 3600)
    assert(MinHashStream.finalizePairs(got.toDF(), 0.9)
      .select("d1", "d2").as[(Long, Long)].collect().toSet == Set((1L, 2L)))
  }

  test("the static-index stream probe equals the batch probe after finalize") {
    implicit val sql = spark.sqlContext
    val corpus = Seq((10L, near1), (11L, near2), (12L, far)).toDF("doc_id", "text")
    val index = graft.dedup.IncrementalMinHash.buildIndex(
      corpus, col("doc_id"), col("text"))
    n += 1
    val name = s"mh_probe_$n"
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SigAt]
    val q = MinHashStream.probeIndexStream(stream.toDS(), index, threshold = 0.0)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      stream.addData(SigAt(at(1), 20L, near1), SigAt(at(2), 21L, far))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name)
      .groupBy("batch_id", "corpus_id").agg(max("est_jaccard").as("est_jaccard"))
      .orderBy("batch_id", "corpus_id").collect().toSeq
    val batchSide = graft.dedup.IncrementalMinHash.probe(index,
        Seq((20L, near1), (21L, far)).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .orderBy("batch_id", "corpus_id").collect().toSeq
    assert(streamed == batchSide)
    assert(streamed.nonEmpty)
  }

  test("a late arrival neither revives expired members nor shrinks live horizons") {
    // doc 1 @100s stored; batch 2 delivers LATE doc 2 @96s (admitted:
    // watermark is still behind) — stored member order is no longer
    // monotonic. doc 3 @107s then probes with retention 10s: cutoff
    // 97s expires ONLY doc 2; the pair must be (1,3), never (2,3).
    val got = run(
      Seq(Seq(SigAt(at(100), 1L, near1)),
        Seq(SigAt(at(96), 2L, near1)),
        Seq(SigAt(at(107), 3L, near1))),
      retentionSec = 10)
    val pairs = MinHashStream.finalizePairs(got.toDF(), 0.9)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)), pairs.toString)
    assert(!pairs.contains((2L, 3L)), pairs.toString)
  }
}
