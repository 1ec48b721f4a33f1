package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.ChangeLog
import graft.streaming.{CdcCurrent, CdcEvent, ChangeLogStream}

/** Streaming CDC latest-state: the final emitted state across
  * micro-batches equals the batch snapshot on the same log, replays
  * are absorbed idempotently, and deletes emit live=false. */
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
      spark.read.parquet(dir).select("id", "ver1", "ver2", "op", "payload")
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
    // replaying the last micro-batch through the handler is a no-op
    ChangeLogStream.materializeBatch(dir, 3)(
      batches.last.toDF().selectExpr("id", "ver1", "ver2", "op", "payload"), 99L)
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
    val rows = spark.read.parquet(dir)
      .select("id", "op").as[(Long, String)].collect().toSet
    assert(rows == Set((5L, "D"), (7L, "U")))
  }

  test("store compaction folds buckets to one file; contents bit-identical") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_compact").toString
    def batch(rows: Seq[CdcEvent], id: Long): Unit =
      ChangeLogStream.materializeBatch(dir, 4)(
        rows.toDF().selectExpr("id", "ver1", "ver2", "op", "payload"), id)
    batch(Seq(CdcEvent(1L, 1L, 1L, "U", "a"), CdcEvent(2L, 1L, 1L, "U", "b"),
      CdcEvent(4L, 1L, 1L, "U", "c")), 0L)
    batch(Seq(CdcEvent(1L, 2L, 2L, "U", "a2"), CdcEvent(5L, 2L, 2L, "U", "d")), 1L)
    batch(Seq(CdcEvent(2L, 3L, 3L, "D", "b"), CdcEvent(9L, 3L, 3L, "U", "e")), 2L)
    // a guaranteed second part in bucket 1 (a wide merge can land a
    // bucket's rows in several tasks → several files; fabricate the
    // fragmentation deterministically with a direct partition append)
    Seq((13L, 1L, 1L, "U", "m")).toDF("id", "ver1", "ver2", "op", "payload")
      .withColumn("bucket", lit(1))
      .write.mode("append").partitionBy("bucket").parquet(dir)
    def parts(): Seq[Int] = new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    def full(): Set[(Long, Long, Long, String, String)] =
      spark.read.parquet(dir).select("id", "ver1", "ver2", "op", "payload")
        .as[(Long, Long, Long, String, String)].collect().toSet
    assert(parts().exists(_ >= 2), "merges should fragment buckets")
    val before = full()
    ChangeLogStream.compactStore(spark, dir)
    assert(parts().forall(_ == 1), s"got ${parts()}")
    assert(full() == before)
    // a merge after compaction behaves exactly as before it
    batch(Seq(CdcEvent(2L, 2L, 9L, "U", "stale")), 3L) // loses to D at ver 3
    assert(full() == before)
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
    // tombstone: retirement must delete the emptied partition dir
    batch(Seq(CdcEvent(1L, 1L, 1L, "U", "a"), CdcEvent(2L, 1L, 1L, "U", "b"),
      CdcEvent(6L, 1L, 1L, "U", "c"), CdcEvent(7L, 2L, 1L, "D", "x")), 0L)
    batch(Seq(CdcEvent(2L, 5L, 1L, "D", "b"), CdcEvent(6L, 20L, 1L, "D", "c")), 1L)
    def full(d: String): Set[(Long, Long, Long, String, String)] =
      spark.read.parquet(d).select("id", "ver1", "ver2", "op", "payload")
        .as[(Long, Long, Long, String, String)].collect().toSet
    val retired = Set((2L, 5L, 1L, "D", "b"), (7L, 2L, 1L, "D", "x"))
    ChangeLogStream.retireTombstones(spark, dirs.head, horizonVer1 = 10L)
    // exactly the sub-horizon tombstones are gone; D(6) at ver 20 stays
    assert(full(dirs.head) == full(dirs(1)) -- retired)
    assert(full(dirs.head).contains((6L, 20L, 1L, "D", "c")))
    // the emptied bucket directory is removed outright
    assert(!new java.io.File(dirs.head, "bucket=3").exists())
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

test("tombstone sidecar: exact per-bucket minimums, sidecar-served retirement " +
      "== scanning retirement, fallback rebuild for legacy stores") {
    implicit val sql = spark.sqlContext
    val dirs = Seq("cdc_tomb_a", "cdc_tomb_b")
      .map(p => java.nio.file.Files.createTempDirectory(p).toString)
    def batch(rows: Seq[CdcEvent], id: Long): Unit = dirs.foreach { d =>
      ChangeLogStream.materializeBatch(d, 4)(
        rows.toDF().selectExpr("id", "ver1", "ver2", "op", "payload"), id)
    }
    batch(Seq(CdcEvent(1L, 1L, 1L, "U", "a"), CdcEvent(2L, 1L, 1L, "U", "b"),
      CdcEvent(6L, 1L, 1L, "U", "c"), CdcEvent(7L, 2L, 1L, "D", "x")), 0L)
    batch(Seq(CdcEvent(2L, 5L, 1L, "D", "b"), CdcEvent(6L, 20L, 1L, "D", "c")), 1L)

    def sidecar(d: String): Set[(Int, Long)] =
      spark.read.parquet(s"$d/_tomb").as[(Int, Long)].collect().toSet
    def derived(d: String): Set[(Int, Long)] =
      spark.read.parquet(d).filter($"op" === "D")
        .groupBy("bucket").agg(org.apache.spark.sql.functions.min($"ver1"))
        .as[(Int, Long)].collect().toSet
    // the merge-maintained sidecar equals the store-derived truth:
    // bucket 2 holds D(2)@5 and D(6)@20 -> tmin 5; bucket 3 D(7)@2
    assert(sidecar(dirs.head) == derived(dirs.head))
    assert(sidecar(dirs.head) == Set((2, 5L), (3, 2L)))

    // store B loses its sidecar (the legacy/torn-publish face): its
    // retirement takes the fallback scan — both stores must land on
    // byte-identical contents, and B's scan rebuilds the sidecar
    val bTomb = new java.io.File(dirs(1), "_tomb")
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
      f.delete(); ()
    }
    rm(bTomb)
    assert(!bTomb.exists())
    dirs.foreach(d =>
      ChangeLogStream.retireTombstones(spark, d, horizonVer1 = 10L))
    def full(d: String): Set[(Long, Long, Long, String, String)] =
      spark.read.parquet(d).select("id", "ver1", "ver2", "op", "payload")
        .as[(Long, Long, Long, String, String)].collect().toSet
    assert(full(dirs.head) == full(dirs(1)),
      "sidecar-served and scanning retirement must retire identically")
    // both sidecars refreshed: only the >= horizon tombstone remains
    assert(sidecar(dirs.head) == Set((2, 20L)))
    assert(sidecar(dirs(1)) == Set((2, 20L)),
      "the fallback scan must rebuild the sidecar")
    // a no-op retirement against a sidecar-less store with nothing to
    // retire still builds the sidecar from its proving scan
    rm(bTomb)
    ChangeLogStream.retireTombstones(spark, dirs(1), horizonVer1 = 10L)
    assert(sidecar(dirs(1)) == Set((2, 20L)))
    // later merges keep maintaining it exactly: D(5)@30 adds a bucket-1
    // tombstone, and U(6)@31 BEATS the remaining D(6)@20, so bucket 2's
    // sidecar row must disappear with its tombstone
    batch(Seq(CdcEvent(5L, 30L, 1L, "D", "z"), CdcEvent(6L, 31L, 1L, "U", "c3")), 2L)
    dirs.foreach(d => assert(sidecar(d) == derived(d), d))
    assert(sidecar(dirs.head) == Set((1, 30L)))
  }

  test("retirement that empties EVERY bucket leaves a working store: the " +
      "sidecar refresh publishes an empty sidecar instead of throwing, and " +
      "later batches merge cleanly") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_allgone").toString
    def batch(rows: Seq[CdcEvent], id: Long): Unit =
      ChangeLogStream.materializeBatch(dir, 3)(
        rows.toDF().selectExpr("id", "ver1", "ver2", "op", "payload"), id)
    def sidecar(): Set[(Int, Long)] =
      spark.read.parquet(s"$dir/_tomb").select("bucket", "tmin")
        .as[(Int, Long)].collect().toSet
    batch(Seq(CdcEvent(1L, 1L, 1L, "U", "a"), CdcEvent(2L, 1L, 1L, "U", "b")), 0L)
    batch(Seq(CdcEvent(1L, 5L, 1L, "D", "a"), CdcEvent(2L, 5L, 1L, "D", "b")), 1L)
    // every winner is now a tombstone below the horizon: retirement
    // empties every bucket (partition dirs removed), and the
    // post-rewrite sidecar refresh has no data files to read — it must
    // publish the EMPTY sidecar, not throw past the closed journal
    ChangeLogStream.retireTombstones(spark, dir, horizonVer1 = 100L)
    assert(!new java.io.File(dir).listFiles().exists(
      _.getName.startsWith("bucket=")), "all buckets must be gone")
    assert(sidecar() === Set.empty, "the refreshed sidecar must be empty")
    // idempotent: a second retirement over the dataless store is a no-op
    ChangeLogStream.retireTombstones(spark, dir, horizonVer1 = 100L)
    assert(sidecar() === Set.empty)
    // and the next batch merges like a bootstrap (a bootstrapped-but-
    // dataless store has no parquet schema to read)
    batch(Seq(CdcEvent(3L, 7L, 1L, "U", "c")), 2L)
    assert(spark.read.parquet(dir).select("id", "ver1", "ver2", "op", "payload")
      .as[(Long, Long, Long, String, String)].collect().toSet ===
      Set((3L, 7L, 1L, "U", "c")))
    assert(sidecar() === Set.empty)
  }
}
