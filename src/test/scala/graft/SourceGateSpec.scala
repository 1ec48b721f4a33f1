package graft

import org.apache.spark.sql.functions._
import graft.text.{SourceGate, TextFeatures}

class SourceGateSpec extends SparkSpec {
  import spark.implicits._

  // goodsrc: keepable docs; junksrc: too-short docs (qualityKeep=false);
  // dupsrc: keepable but one text repeated
  private def docs() = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again", "goodsrc"),
    (2L, "a stitch in time saves nine and the rest of it", "goodsrc"),
    (3L, "all that glitters is not gold in the end of story", "goodsrc"),
    (4L, "short junk", "junksrc"),
    (5L, "tiny", "junksrc"),
    (6L, "no stops here", "junksrc"),
    (7L, "the same text repeated in a dup farm of the web", "dupsrc"),
    (8L, "the same text repeated in a dup farm of the web", "dupsrc"),
    (9L, "the same text repeated in a dup farm of the web", "dupsrc")
  ).toDF("id", "text", "src")

  test("stats: keep_rate mirrors qualityKeep, dup_ratio counts within-source dup mass") {
    val st = SourceGate.stats(docs(), col("id"), col("text"), col("src"),
        minDocs = 3L, minKeepRate = 0.6, maxDupRatio = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(5))).toMap
    assert(st("goodsrc") == ((3L, 1.0, 0.0, 1)))
    assert(st("junksrc")._2 == 0.0 && st("junksrc")._4 == 0)
    // dupsrc: 3 docs, 1 distinct -> dup_ratio 2/3; keepable text but gated
    // out by the dup mass
    assert(st("dupsrc")._1 == 3L && st("dupsrc")._3 == 0.6667 && st("dupsrc")._4 == 0)
  }

  test("minDocs gate cuts thin sources regardless of quality") {
    val st = SourceGate.stats(docs(), col("id"), col("text"), col("src"),
        minDocs = 4L, minKeepRate = 0.0, maxDupRatio = 1.0)
      .collect().map(r => r.getString(0) -> r.getInt(5)).toMap
    assert(st.values.forall(_ == 0), "3-doc sources must fail minDocs=4")
  }

  test("filterDocs keeps exactly the gated-in sources' docs via broadcast semi join") {
    val out = SourceGate.filterDocs(docs(), col("id"), col("text"), col("src"),
      minDocs = 3L, minKeepRate = 0.6, maxDupRatio = 0.5)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi gate:\n${plan.take(1200)}")
  }

  test("source keep_rate equals the doc-level gate's per-source keep fraction (no drift)") {
    val d = Tables.documents(spark, sfDir)
    val st = SourceGate.stats(d, col("doc_id"), col("text"), col("source"))
      .select(col("source"), col("keep_rate"))
    val perDoc = d.select(col("source"),
        TextFeatures.qualityKeep(col("text")).cast("int").as("k"))
      .groupBy("source")
      .agg(graft.functions.Numeric.cround(avg(col("k")), 4).as("kr"))
    val joined = st.join(perDoc, "source")
      .filter(col("keep_rate") =!= col("kr")).count()
    assert(joined == 0L)
  }
}
