package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{AnnHit, VecAt, VectorProbeStream}
import graft.vector.{IndexStore, IvfAnn, Similarity}

/** Streaming probe of the persisted IVF index: row-for-row parity with
  * the batch serving plan over the SAME loaded artifact (the 24d
  * pattern), across micro-batches, at covering and partial nprobe. */
class VectorProbeStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def at(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  /** Run the stream over the given micro-batches of query ids against
    * the loaded index, returning the served hits. */
  private def runStream(batches: Seq[Seq[Long]], assigned: org.apache.spark.sql.DataFrame,
                        cents: org.apache.spark.sql.DataFrame,
                        corpus: org.apache.spark.sql.DataFrame,
                        k: Int, nprobe: Int): Seq[AnnHit] = {
    implicit val sql = spark.sqlContext
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    n += 1
    val name = s"vec_probe_$n"
    val stream = MemoryStream[VecAt]
    val q = VectorProbeStream.probeIvfStream(
        stream.toDS(), assigned, cents, corpus, k, nprobe)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.zipWithIndex.foreach { case (ids, bi) =>
      stream.addData(ids.map(id => VecAt(at(bi * 10 + 1), id, emb(id).toSeq)): _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[AnnHit].collect().toSeq
  }

  private def batchHits(queryIds: Seq[Long], assigned: org.apache.spark.sql.DataFrame,
                        cents: org.apache.spark.sql.DataFrame,
                        corpus: org.apache.spark.sql.DataFrame,
                        k: Int, nprobe: Int): Set[(Long, Int, Long)] = {
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
    IvfAnn.topKWith(assigned, cents, corpus, queries, k, nprobe)
      .as[(Long, Int, Long)].collect().toSet
  }

  test("stream == batch probe row-for-row over the persisted artifact") {
    val emb = Tables.embeddings(spark, sfDir)
    val (assigned, cents) = IvfAnn.quantize(emb, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf_probe").toString
    IndexStore.saveIvf(dir, emb, assigned, cents)
    val (a2, c2, corpus2) = IndexStore.loadIvf(spark, dir)
    val ids = Seq(Seq(1L, 2L, 3L), Seq(7L, 11L)) // two micro-batches
    val streamed = runStream(ids, a2, c2, corpus2, k = 5, nprobe = 4)
    val batch = batchHits(ids.flatten, a2, c2, corpus2, k = 5, nprobe = 4)
    assert(streamed.map(h => (h.q_id, h.rank, h.n_id)).toSet == batch)
    assert(streamed.size == batch.size) // no duplicate emissions
    assert(streamed.nonEmpty)
  }

  test("covering nprobe serves the exact brute-force answer from the stream") {
    val emb = Tables.embeddings(spark, sfDir)
    val (assigned, cents) = IvfAnn.quantize(emb, nlist = 8)
    val streamed = runStream(Seq(Seq(1L, 5L, 9L)), assigned, cents, emb,
      k = 5, nprobe = 8)
    val exact = Similarity.bruteTopK(emb, emb.filter(col("vec_id").isin(1L, 5L, 9L)), 5)
      .as[(Long, Int, Long)].collect().toSet
    assert(streamed.map(h => (h.q_id, h.rank, h.n_id)).toSet == exact)
  }

  test("the served sims are the exact cosines, ranks dense from 1") {
    val emb = Tables.embeddings(spark, sfDir)
    val (assigned, cents) = IvfAnn.quantize(emb, nlist = 8)
    val streamed = runStream(Seq(Seq(4L)), assigned, cents, emb, k = 3, nprobe = 8)
    val byRank = streamed.sortBy(_.rank)
    assert(byRank.map(_.rank) == (1 to byRank.size))
    assert(byRank.map(_.sim) == byRank.map(_.sim).sorted.reverse)
    // cross-check rank-1 against the driver-side exact cosine
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val top = byRank.head
    assert(top.sim == cos(vecs(4L), vecs(top.n_id)))
  }

  test("a replayed query id re-serves identically (stateless idempotence)") {
    val emb = Tables.embeddings(spark, sfDir)
    val (assigned, cents) = IvfAnn.quantize(emb, nlist = 8)
    val streamed = runStream(Seq(Seq(6L), Seq(6L)), assigned, cents, emb,
      k = 4, nprobe = 4)
    val (b1, b2) = streamed.splitAt(streamed.size / 2)
    assert(b1.toSet == b2.toSet)
    assert(b1.map(h => (h.q_id, h.rank, h.n_id)).toSet ==
      batchHits(Seq(6L), assigned, cents, emb, k = 4, nprobe = 4))
  }
}
