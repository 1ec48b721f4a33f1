package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{HeavyHitterStream, ItemAt, WindowHH}

/** Streaming per-window heavy hitters: watermark-closed emission,
  * candidate superset of the batch exact frequent-item set per closed
  * window, lower-bound counters, bounded candidates, shard
  * consistency. */
class HeavyHitterStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def at(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  /** Feeds each batch, plus two far-future flush batches so the
    * watermark passes every window under test and the event-time
    * timeouts fire. */
  private def run(batches: Seq[Seq[ItemAt]], windowSec: Long, k: Int,
                  shards: Int): Seq[WindowHH] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"hh_stream_$n"
    val stream = MemoryStream[ItemAt]
    val q = HeavyHitterStream.windowedFrequentItems(
        stream.toDS(), windowSec, k, shards, watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val flush1 = Seq(ItemAt(at(100000L), "_flush"))
    val flush2 = Seq(ItemAt(at(100001L), "_flush"))
    try (batches ++ Seq(flush1, flush2)).foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[WindowHH].collect().toSeq
      .filter(_.item != "_flush")
  }

  test("closed windows emit a superset of the exact frequent-item set") {
    // window [0, 60): "a" x 12, "b" x 6, 12 singletons; threshold 1/4
    // of 30 rows = 7.5 -> exactly {a}; 1/8 -> {a, b}
    val w0 = (1 to 12).map(i => ItemAt(at(i.toLong), "a")) ++
      (1 to 6).map(i => ItemAt(at(13L + i), "b")) ++
      (1 to 12).map(i => ItemAt(at(31L + i % 20), s"t$i"))
    // window [60, 120): "z" dominates
    val w1 = (1 to 8).map(i => ItemAt(at(60L + i), "z")) ++
      (1 to 4).map(i => ItemAt(at(70L + i), s"u$i"))
    val got = run(Seq(w0, w1), windowSec = 60L, k = 8, shards = 4)
    val got0 = got.filter(_.window_start == 0L)
    val got1 = got.filter(_.window_start == 60L)
    // batch exact heavy hitters per window slice
    def exact(rows: Seq[ItemAt], num: Long, den: Long): Set[String] =
      graft.operators.HeavyHitters.frequentItems(
          rows.map(_.item).toDF("item"), col("item"), num, den, sketchK = 64)
        .select("item").as[String].collect().toSet
    assert(exact(w0, 1, 4).subsetOf(got0.map(_.item).toSet))
    assert(exact(w0, 1, 8).subsetOf(got0.map(_.item).toSet))
    assert(exact(w1, 1, 2).subsetOf(got1.map(_.item).toSet))
    // counters are lower bounds on the true per-window counts
    val true0 = w0.groupBy(_.item).view.mapValues(_.size.toLong).toMap
    got0.foreach { hh =>
      assert(hh.cnt <= true0(hh.item), s"counter above truth: $hh")
    }
    // each window emits at most shards * k candidates (bounded state)
    assert(got0.size <= 4 * 8)
    assert(got1.size <= 4 * 8)
  }

  test("every occurrence of an item lands in one shard: dominant counts survive sharding") {
    // one very heavy item among uniform noise, many shards
    val rows = (1 to 40).map(i => ItemAt(at(i.toLong % 50), "big")) ++
      (1 to 20).map(i => ItemAt(at(i.toLong % 50), s"n$i"))
    val got = run(Seq(rows), windowSec = 60L, k = 4, shards = 8)
    val big = got.find(_.item == "big")
    assert(big.nonEmpty, s"dominant item lost: $got")
    // within n_shard/(k+1) of the true count; n_shard <= 40 + its
    // shard's noise share, so the counter is at least 40 - 60/5
    assert(big.get.cnt >= 40L - 12L, s"counter too low: ${big.get}")
  }

  test("a later-than-delay row is dropped: a closed window never reopens") {
    // window [0,60) data, then a far-future batch (watermark passes 60
    // and the window closes), then a LATE window-0 row: Spark's
    // watermark filter drops it before the state function, so the
    // closed window stays closed — exactly one candidate row
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"hh_stream_$n"
    val stream = MemoryStream[ItemAt]
    val q = HeavyHitterStream.windowedFrequentItems(
        stream.toDS(), windowSec = 60L, k = 4, shards = 1,
        watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try Seq(
      (1 to 6).map(i => ItemAt(at(i.toLong), "early")),
      Seq(ItemAt(at(1000L), "_flush")),
      Seq(ItemAt(at(1001L), "_flush")),
      Seq(ItemAt(at(10L), "late")), // beyond the 5s delay
      Seq(ItemAt(at(2000L), "_flush")),
      Seq(ItemAt(at(2001L), "_flush"))
    ).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table(name).as[WindowHH].collect().toSeq
      .filter(r => r.item != "_flush" && r.window_start == 0L)
    assert(got.map(_.item).toSet === Set("early"), s"got $got")
    assert(got.size === 1, s"window 0 emitted more than once: $got")
  }

  test("exactify turns streamed candidates into the exact per-window threshold set") {
    val w0 = (1 to 12).map(i => ItemAt(at(i.toLong), "a")) ++
      (1 to 6).map(i => ItemAt(at(13L + i), "b")) ++
      (1 to 12).map(i => ItemAt(at(31L + i % 20), s"t$i"))
    val w1 = (1 to 8).map(i => ItemAt(at(60L + i), "z")) ++
      (1 to 4).map(i => ItemAt(at(70L + i), s"u$i"))
    val streamed = run(Seq(w0, w1), windowSec = 60L, k = 8, shards = 4)
    val events = (w0 ++ w1).toDS()
    val got = HeavyHitterStream.exactify(
        streamed.toDF(), events, windowSec = 60L, num = 1L, den = 4L)
      .as[(Long, String, Long)].collect().toSet
    // batch truth per window at the same 1/4 threshold
    def batchSet(rows: Seq[ItemAt], w: Long): Set[(Long, String, Long)] =
      graft.operators.HeavyHitters.frequentItems(
          rows.toDF(), col("item"), 1L, 4L, 8)
        .as[(String, Long)].collect().map { case (i, c) => (w, i, c) }.toSet
    assert(got === batchSet(w0, 0L) ++ batchSet(w1, 60L))
    assert(got.nonEmpty)
  }

  test("windows are independent: a window's candidates come from its rows only") {
    val w0 = (1 to 10).map(i => ItemAt(at(i.toLong), "only0"))
    val w1 = (1 to 10).map(i => ItemAt(at(61L + i % 50), "only1"))
    val got = run(Seq(w0 ++ w1), windowSec = 60L, k = 4, shards = 2)
    assert(got.filter(_.window_start == 0L).map(_.item).toSet === Set("only0"))
    assert(got.filter(_.window_start == 60L).map(_.item).toSet === Set("only1"))
  }
}
