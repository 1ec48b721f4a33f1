package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ChangeLog

/** CDC latest-state snapshot: hand cases for version ordering and
  * delete semantics, column contract, and exact parity with the
  * textbook ROW_NUMBER materialization on the real events table. */
class ChangeLogSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // key 1: two upserts — latest (ts 3) wins
    (1L, 1L, 10L, "U", "a"),
    (1L, 3L, 11L, "U", "b"),
    // key 2: delete is the latest — key leaves the snapshot
    (2L, 1L, 20L, "U", "c"),
    (2L, 5L, 21L, "D", "c"),
    // key 3: delete SUPERSEDED by a later upsert — key lives
    (3L, 2L, 30L, "D", "x"),
    (3L, 4L, 31L, "U", "d"),
    // key 4: single upsert
    (4L, 9L, 40L, "U", "e"),
    // key 5: same ts twice — event_id tie-breaks
    (5L, 7L, 51L, "U", "old"),
    (5L, 7L, 52L, "U", "new")
  ).toDF("id", "ts", "event_id", "op", "payload")

  test("latest version wins, deletes drop keys, superseded deletes do not") {
    val got = ChangeLog.snapshot(log, Seq("id"), Seq("ts", "event_id"), "op")
      .select("id", "ts", "event_id", "payload")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 3L, 11L, "b"),
      (3L, 4L, 31L, "d"),
      (4L, 9L, 40L, "e"),
      (5L, 7L, 52L, "new")))
  }

  test("output carries key + version + payload, never the op column") {
    val out = ChangeLog.snapshot(log, Seq("id"), Seq("ts", "event_id"), "op")
    assert(out.columns.toSeq == Seq("id", "ts", "event_id", "payload"))
  }

  test("exact parity with the ROW_NUMBER materialization on real events") {
    val src = Tables.load(spark, sfDir, "events").selectExpr(
      "user_id % 50 AS id", "ts", "event_id",
      "CASE WHEN event_id % 11 = 0 THEN 'D' ELSE 'U' END AS op",
      "event_type", "value")
    val got = ChangeLog.snapshot(src, Seq("id"), Seq("ts", "event_id"), "op")
    val w = Window.partitionBy(col("id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val want = src.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") === "U")
      .select("id", "ts", "event_id", "event_type", "value")
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
