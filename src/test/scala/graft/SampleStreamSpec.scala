package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{IdAt, SampleStream, WindowCand}
import graft.text.SampleK

class SampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long) = new Timestamp(sec * 1000L)
  private var n = 0

  private def run(batches: Seq[Seq[IdAt]], windowSec: Long, k: Int,
                  shards: Int): Seq[WindowCand] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"samp_stream_$n"
    val stream = MemoryStream[IdAt]
    val q = SampleStream.windowedSampleK(
        stream.toDS(), windowSec, k, shards, watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // flush rows far in the future push the watermark past every window
    val flush1 = Seq(IdAt(at(100000L), -1L))
    val flush2 = Seq(IdAt(at(100001L), -2L))
    try (batches ++ Seq(flush1, flush2)).foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[WindowCand].collect().toSeq
      .filter(_.id >= 0L)
  }

  test("finalized stream sample equals the batch SampleK draw per closed window") {
    // two windows of 40 ids each
    val w0 = (0L until 40L).map(i => IdAt(at(1L + i % 50), 100L + i))
    val w1 = (0L until 40L).map(i => IdAt(at(61L + i % 50), 500L + i))
    val cands = run(Seq(w0, w1), windowSec = 60L, k = 7, shards = 4)
    val got = SampleStream.finalizeK(cands.toDF(), 7)
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // batch oracle: SampleK over the same membership, grouped by window
    val batchDf = (w0 ++ w1).toDF("ts", "id")
      .withColumn("w", expr("(CAST(ts AS LONG) div 60) * 60"))
    val want = SampleK.sampleExactK(batchDf, col("id"), col("w"), 7)
      .as[(Long, Long)].collect().groupBy(_._2)
      .view.mapValues(_.map(_._1).toSet).toMap
    assert(got.keySet == Set(0L, 60L) && want.keySet == Set(0L, 60L))
    assert(got(0L) == want(0L) && got(60L) == want(60L),
      s"stream draw diverged from batch: $got vs $want")
  }

  test("state is bounded: each (window, shard) emits at most k candidates") {
    val w0 = (0L until 200L).map(i => IdAt(at(1L + i % 50), i))
    val cands = run(Seq(w0), windowSec = 60L, k = 5, shards = 3)
    val perShard = cands.groupBy(c =>
      (c.window_start, math.floorMod(java.lang.Long.hashCode(c.id), 3)))
    assert(perShard.values.forall(_.size <= 5), "a shard emitted more than k")
    assert(cands.size <= 15)
    // and finalize returns exactly k
    assert(SampleStream.finalizeK(cands.toDF(), 5).count() == 5L)
  }

  test("replayed ids do not occupy two slots (at-least-once delivery)") {
    val rows = (0L until 30L).map(i => IdAt(at(1L + i % 20), 2000L + i))
    // deliver the first ten rows twice across micro-batches
    val cands = run(Seq(rows, rows.take(10)), windowSec = 60L, k = 8, shards = 2)
    val ids = SampleStream.finalizeK(cands.toDF(), 8)
      .as[(Long, Long)].collect().map(_._2)
    assert(ids.length == ids.distinct.length, "a replayed id duplicated in the draw")
    // and the draw equals the no-replay run
    val clean = run(Seq(rows), windowSec = 60L, k = 8, shards = 2)
    assert(SampleStream.finalizeK(cands.toDF(), 8).as[(Long, Long)].collect().toSet ==
      SampleStream.finalizeK(clean.toDF(), 8).as[(Long, Long)].collect().toSet)
  }

  test("micro-batch split invariance: the same membership yields the same draw") {
    val rows = (0L until 60L).map(i => IdAt(at(1L + i % 50), 1000L + i))
    val a = run(Seq(rows), 60L, 6, 4)
    // split by event time so the second batch stays ahead of the
    // watermark (a mid-window id-parity split would put rows behind it
    // — that's the documented late-data drop, not a draw change)
    val (x, y) = rows.partition(_.ts.getTime <= 25000L)
    val b = run(Seq(x, y), 60L, 6, 4)
    val fa = SampleStream.finalizeK(a.toDF(), 6).as[(Long, Long)].collect().toSet
    val fb = SampleStream.finalizeK(b.toDF(), 6).as[(Long, Long)].collect().toSet
    assert(fa == fb, "draw changed with micro-batch arrangement")
  }
}
