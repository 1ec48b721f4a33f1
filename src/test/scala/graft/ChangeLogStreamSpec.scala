package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.ChangeLog
import graft.streaming.{CdcCurrent, CdcEvent, ChangeLogStream}

/** Streaming CDC latest-state: the final emitted state across
  * micro-batches equals the batch snapshot on the same log, replays
  * are absorbed idempotently, deletes emit live=false — plus the
  * materialized store's merge/tombstone/retirement semantics on the
  * manifest protocol (the store's isolation and crash faces live in
  * ChangeLogSnapshotSpec). */
class ChangeLogStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def run(batches: Seq[Seq[CdcEvent]]): Map[Long, CdcCurrent] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"cdc_$n"
    val stream = MemoryStream[CdcEvent]
    val q = ChangeLogStream.snapshotStream(stream.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    // update mode appends one row per touched key per batch into the
    // memory sink; the key's CURRENT state is its highest-version row
    spark.table(name).as[CdcCurrent].collect()
      .groupBy(_.id)
      .map { case (id, rows) => id -> rows.maxBy(r => (r.ver1, r.ver2)) }
  }

  test("final state across micro-batches equals the batch snapshot") {
    val log = Seq(
      CdcEvent(1L, 1L, 10L, "U", "a"), CdcEvent(1L, 3L, 11L, "U", "b"),
      CdcEvent(2L, 1L, 20L, "U", "c"), CdcEvent(2L, 5L, 21L, "D", "c"),
      CdcEvent(3L, 2L, 30L, "D", "x"), CdcEvent(3L, 4L, 31L, "U", "d"),
      CdcEvent(4L, 9L, 40L, "U", "e"))
    // out-of-order across batches: the late batch carries EARLIER
    // versions — max-merge must not regress
    val batches = Seq(
      Seq(log(1), log(3), log(4)), // latest-first for keys 1,2; delete for 3
      Seq(log(0), log(2), log(5), log(6)))
    val got = run(batches)
    val live = got.values.filter(_.live).map(c => (c.id, c.ver1, c.ver2, c.payload)).toSet
    val want = ChangeLog.snapshot(
        log.toDF(), Seq("id"), Seq("ver1", "ver2"), "op")
      .select("id", "ver1", "ver2", "payload")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(live == want)
    assert(!got(2L).live) // delete is latest: emitted as a retraction
  }

  test("replayed changes are absorbed idempotently (max-merge semilattice)") {
    val b = Seq(CdcEvent(7L, 1L, 1L, "U", "x"), CdcEvent(7L, 2L, 2L, "U", "y"))
    val got = run(Seq(b, b, b)) // same batch three times
    assert(got(7L) == CdcCurrent(7L, 2L, 2L, live = true, "y"))
  }

  test("materialized store: live rows equal the batch snapshot; tombstones block resurrection; replay is a no-op") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_store").toString
    val log = Seq(
      CdcEvent(1L, 1L, 10L, "U", "a"), CdcEvent(1L, 3L, 11L, "U", "b"),
      CdcEvent(2L, 1L, 20L, "U", "c"), CdcEvent(2L, 5L, 21L, "D", "c"),
      CdcEvent(3L, 2L, 30L, "D", "x"), CdcEvent(3L, 4L, 31L, "U", "d"),
      CdcEvent(4L, 9L, 40L, "U", "e"),
      CdcEvent(6L, 1L, 60L, "U", "z"), CdcEvent(6L, 2L, 61L, "D", "z"))
    val batches = Seq(
      Seq(log(0), log(2), log(4), log(7)),
      Seq(log(1), log(3), log(5), log(6), log(8)))
    val stream = MemoryStream[CdcEvent]
    val q = ChangeLogStream.materialize(stream.toDS(), dir, s"$dir/_ckpt",
      nBuckets = 3)
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    def full(): Set[(Long, Long, Long, String, String)] =
      ChangeLogStream.readSnapshot(spark, dir)
        .as[(Long, Long, Long, String, String)].collect().toSet
    def live(): Set[(Long, Long, Long, String)] =
      full().filter(_._4 != "D").map(r => (r._1, r._2, r._3, r._5))
    val want = ChangeLog.snapshot(log.toDF(), Seq("id"),
        Seq("ver1", "ver2"), "op")
      .select("id", "ver1", "ver2", "payload")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(live() == want)
    // deleted keys keep TOMBSTONES (id, winning version, 'D'): the
    // store stays a readable table and stale upserts can be refused
    assert(full().contains((2L, 5L, 21L, "D", "c")))
    assert(full().contains((6L, 2L, 61L, "D", "z")))
    val before = full()
    // replaying an applied batch id through the handler is marker-
    // skipped — no new generation, contents untouched
    val gen = graft.sources.SnapshotStore.currentGen(spark, dir)
    ChangeLogStream.materializeBatch(dir, 3)(
      batches.last.toDF().selectExpr("id", "ver1", "ver2", "op", "payload"), 1L)
    assert(graft.sources.SnapshotStore.currentGen(spark, dir) == gen)
    assert(full() == before)
    // a stale out-of-order upsert for a LIVE key cannot regress it
    ChangeLogStream.materializeBatch(dir, 3)(
      Seq(CdcEvent(1L, 2L, 12L, "U", "stale")).toDF()
        .selectExpr("id", "ver1", "ver2", "op", "payload"), 100L)
    assert(full() == before)
    // THE tombstone pin: a stale upsert for a DELETED key loses to
    // the tombstone's higher version — the key must NOT resurrect
    ChangeLogStream.materializeBatch(dir, 3)(
      Seq(CdcEvent(6L, 1L, 59L, "U", "zombie")).toDF()
        .selectExpr("id", "ver1", "ver2", "op", "payload"), 101L)
    assert(full() == before)
    assert(live() == want)
    // merge IS the compactor: after all those merges, every bucket is
    // exactly one live manifest line (no separate compaction exists)
    val perBucket = graft.sources.SnapshotStore.currentFiles(spark, dir)
      .flatMap(l => "/bucket=(\\d+)/".r.findFirstMatchIn(l)
        .map(_.group(1).toInt))
      .groupBy(identity).map(_._2.length)
    assert(perBucket.nonEmpty && perBucket.forall(_ == 1),
      s"one live file per bucket expected, got $perBucket")
  }

  test("materialized store bootstrap survives an all-deletes first batch") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_store_d").toString
    val stream = MemoryStream[CdcEvent]
    val q = ChangeLogStream.materialize(stream.toDS(), dir, s"$dir/_ckpt",
      nBuckets = 2)
    try {
      stream.addData(CdcEvent(5L, 1L, 50L, "D", "gone"))
      q.processAllAvailable() // first batch writes only a tombstone
      stream.addData(CdcEvent(7L, 1L, 70L, "U", "live"))
      q.processAllAvailable() // second batch must read the store fine
    } finally q.stop()
    val rows = ChangeLogStream.readSnapshot(spark, dir)
      .select("id", "op").as[(Long, String)].collect().toSet
    assert(rows == Set((5L, "D"), (7L, "U")))
  }

  test("tombstone retirement below the horizon changes no still-possible outcome") {
    implicit val sql = spark.sqlContext
    // two IDENTICAL stores built from the same batches; one retires
    val dirs = Seq("cdc_ret_a", "cdc_ret_b")
      .map(p => java.nio.file.Files.createTempDirectory(p).toString)
    def batch(rows: Seq[CdcEvent], id: Long): Unit = dirs.foreach { d =>
      ChangeLogStream.materializeBatch(d, 4)(
        rows.toDF().selectExpr("id", "ver1", "ver2", "op", "payload"), id)
    }
    // keys chosen so bucket 3 (= id % 4) holds ONLY the key-7
    // tombstone: retirement must leave that bucket with no live lines
    batch(Seq(CdcEvent(1L, 1L, 1L, "U", "a"), CdcEvent(2L, 1L, 1L, "U", "b"),
      CdcEvent(6L, 1L, 1L, "U", "c"), CdcEvent(7L, 2L, 1L, "D", "x")), 0L)
    batch(Seq(CdcEvent(2L, 5L, 1L, "D", "b"), CdcEvent(6L, 20L, 1L, "D", "c")), 1L)
    def full(d: String): Set[(Long, Long, Long, String, String)] =
      ChangeLogStream.readSnapshot(spark, d)
        .as[(Long, Long, Long, String, String)].collect().toSet
    val retired = Set((2L, 5L, 1L, "D", "b"), (7L, 2L, 1L, "D", "x"))
    ChangeLogStream.retireTombstones(spark, dirs.head, horizonVer1 = 10L,
      nBuckets = 4)
    // exactly the sub-horizon tombstones are gone; D(6) at ver 20 stays
    assert(full(dirs.head) == full(dirs(1)) -- retired)
    assert(full(dirs.head).contains((6L, 20L, 1L, "D", "c")))
    // the emptied bucket publishes no lines at all
    assert(!graft.sources.SnapshotStore.currentFiles(spark, dirs.head)
      .exists(_.contains("/bucket=3/")))
    // every event that can still arrive (ver1 >= horizon) produces the
    // same store state with or without the retired tombstones: a fresh
    // upsert for a retired key wins in both (it beat ver 2 anyway), a
    // stale-vs-kept-tombstone upsert loses in both
    batch(Seq(CdcEvent(7L, 11L, 1L, "U", "back"),
      CdcEvent(6L, 15L, 1L, "U", "zombie"), // loses to D at ver 20 in both
      CdcEvent(2L, 12L, 1L, "U", "b2")), 2L)
    assert(full(dirs.head) == full(dirs(1)))
    def live(d: String) = full(d).filter(_._4 != "D")
    assert(live(dirs.head).map(r => (r._1, r._5)) ==
      Set((1L, "a"), (7L, "back"), (2L, "b2")))
  }

  test("stream parity with the batch snapshot on the real events table") {
    val src = Tables.load(spark, sfDir, "events").selectExpr(
        "user_id % 50 AS id", "unix_micros(CAST(ts AS TIMESTAMP)) AS ver1",
        "event_id AS ver2",
        "CASE WHEN event_id % 11 = 0 THEN 'D' ELSE 'U' END AS op",
        "event_type AS payload")
    val rows = src.as[CdcEvent].collect().toSeq
    val got = run(rows.grouped(math.max(1, rows.size / 3)).toSeq)
    val want = ChangeLog.snapshot(src.toDF(), Seq("id"),
        Seq("ver1", "ver2"), "op")
      .select("id", "ver1", "ver2", "payload")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got.values.filter(_.live)
      .map(c => (c.id, c.ver1, c.ver2, c.payload)).toSet == want)
  }
}
