package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{VecAt, VectorProbeStream}
import graft.vector.{IndexStore, IvfAnn, Similarity}

/** Streaming IVF append: arrivals routed under the frozen persisted
  * quantizer into a (cell, batch_id)-partitioned delta; the extended
  * loader serves base ∪ delta; replays are idempotent. */
class IvfAppendSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("streamed arrivals land cell-correct and the loader serves base+delta") {
    implicit val sql = spark.sqlContext
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val arrivalIds = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select("vec_id").as[Long].collect().sorted.toSeq
    val (assigned, cents) = IvfAnn.quantize(base, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf_app").toString
    IndexStore.saveIvf(dir, base, assigned, cents)

    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val stream = MemoryStream[VecAt]
    val (b1, b2) = arrivalIds.splitAt(arrivalIds.size / 2)
    val q = VectorProbeStream.appendIvfStream(stream.toDS(),
      IndexStore.loadIvf(spark, dir)._2, // manifest-resolved centroids
      s"$dir/delta", s"$dir/ckpt")
    try Seq(b1, b2).zipWithIndex.foreach { case (ids, bi) =>
      stream.addData(ids.map(id => VecAt(at(bi + 1), id, vecs(id).toSeq)): _*)
      q.processAllAvailable()
    } finally q.stop()

    val (a2, c2, corpus2) = IndexStore.loadIvfWithDelta(spark, dir, s"$dir/delta")
    assert(corpus2.count() == emb.count())
    // every delta row sits in its driver-computed nearest cell (the
    // frozen quantizer's geometry, ties by cell asc)
    val centArr = c2.select(col("cell"), col("c_emb"), col("c_norm2"))
      .as[(Int, Array[Float], Double)].collect().sortBy(_._1)
    def nearest(v: Array[Float]): Int = centArr.map { case (cell, ce, n2) =>
      val d = n2 - 2.0 * ce.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum
      (d, cell)
    }.min._2
    val deltaCells = spark.read.parquet(s"$dir/delta")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(deltaCells.keySet == arrivalIds.toSet)
    arrivalIds.foreach(id => assert(deltaCells(id) == nearest(vecs(id)),
      s"vec $id routed to ${deltaCells(id)}, nearest ${nearest(vecs(id))}"))
    // covering probe over the extended index == brute force over the
    // full corpus — the appended vectors are served
    val queries = corpus2.filter(col("vec_id").isin(5L, 10L, 3L))
    val got = IvfAnn.topKWith(a2, c2, corpus2, queries, 5, nprobe = 8)
      .as[(Long, Int, Long)].collect().toSet
    val want = Similarity.bruteTopK(emb, emb.filter(col("vec_id").isin(5L, 10L, 3L)), 5)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want)
  }

  test("a replayed micro-batch overwrites its own partitions, never duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_replay").toString
    val batch = Seq((1L, Seq(1.0f, 0.0f), 3), (2L, Seq(0.0f, 1.0f), 5))
      .toDF("vec_id", "embedding", "cell")
    VectorProbeStream.appendBatch(dir)(batch, 7L)
    VectorProbeStream.appendBatch(dir)(batch, 7L) // replay
    val rows = spark.read.parquet(dir)
    assert(rows.count() == 2)
    assert(rows.select("batch_id").distinct().as[Long].collect().toSeq == Seq(7L))
    // a different batch appends alongside, untouched by the replay
    VectorProbeStream.appendBatch(dir)(batch.withColumn("vec_id", col("vec_id") + 10), 8L)
    VectorProbeStream.appendBatch(dir)(batch, 7L) // replay again
    assert(spark.read.parquet(dir).count() == 4)
  }
}
