package graft

import org.apache.spark.sql.functions._
import graft.text.{PadBatch, SnapshotDiff}

class SnapshotPadSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff: added/removed/changed/unchanged classified by id and content") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "text")
    val b = Seq((2L, "two"), (3L, "trois"), (4L, "four")).toDF("id", "text")
    val d = SnapshotDiff.diff(a, col("id"), col("text"), b, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "removed", 3L -> "changed", 4L -> "added"),
      s"got $d (unchanged row 2 must be dropped)")
    val s = SnapshotDiff.summary(a, col("id"), col("text"), b, col("id"), col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("removed" -> 1L, "changed" -> 1L, "added" -> 1L, "unchanged" -> 1L))
  }

  test("snapshot diff join carries hashes, not documents") {
    // parquet-backed input so ConvertToLocalRelation cannot fold the
    // hash computation away before the plan assert
    val a = Tables.documents(spark, sfDir)
    val plan = SnapshotDiff.diff(a, col("doc_id"), col("text"),
      a, col("doc_id"), col("text")).queryExecution.optimizedPlan.toString
    assert(plan.contains("xxhash64") && !plan.contains("text#0 = text#"),
      s"diff must compare fingerprints:\n${plan.take(800)}")
  }

  test("padding buckets: boundary assignment, overflow mass, efficiency arithmetic") {
    val docs = Seq(
      (1L, 64L), (2L, 65L), (3L, 10L),   // 64-boundary lands IN 64
      (4L, 2000L)                        // over the last bound
    ).toDF("id", "n")
    val out = PadBatch.bucketStats(docs, col("id"), col("n"), Seq(64L, 128L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // bucket 64: docs 1,3 -> tokens 74, padded 128, eff 0.578125
    assert(out(64L) == ((2L, 74L, 128L, 0.578125)))
    // bucket 128 is the LAST bucket, so overflow doc 4 lands here too,
    // padding to its true length (visible as depressed efficiency,
    // never > 1): doc 2 (65 -> 128) + doc 4 (2000 -> 2000)
    assert(out(128L) == ((2L, 2065L, 2128L, 0.970395)))
    assert(out.keySet == Set(64L, 128L))
  }

  test("padding report covers every doc exactly once on real data") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("_tc", graft.functions.TokenCounts(col("text")))
    val out = PadBatch.bucketStats(docs, col("doc_id"),
      col("_tc.n_ws_tokens"), Seq(64L, 128L, 256L))
    assert(out.agg(sum("n_docs")).head().getLong(0) == docs.count())
    assert(out.collect().forall(r => r.getDouble(4) <= 1.0))
  }
}
