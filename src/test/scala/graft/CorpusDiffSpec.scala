package graft

import org.apache.spark.sql.functions._
import graft.text.CorpusDiff

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed two-token drift") {
    val a = Seq((1L, "x x x y")).toDF("id", "text") // cnt: x=3, y=1
    val b = Seq((1L, "x y y y")).toDF("id", "text") // cnt: x=1, y=3
    val out = CorpusDiff.tokenDrift(a, col("text"), b, col("text"), 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // na=nb=4, v=2; pa(x)=4/6, pb(x)=2/6 -> contrib = 2/3*ln(2) ~ 0.46209812
    assert(out("x")._1 == 3L && out("x")._2 == 1L)
    assert(math.abs(out("x")._3 - (2.0 / 3 * math.log(2.0))) < 1e-6)
    assert(math.abs(out("y")._3 - (1.0 / 3 * math.log(0.5))) < 1e-6)
  }

  test("a token present only in A tops the report; identical corpora drift to zero") {
    val a = Seq((1L, "common common planted planted planted")).toDF("id", "text")
    val b = Seq((1L, "common common common common common")).toDF("id", "text")
    val top = CorpusDiff.tokenDrift(a, col("text"), b, col("text"), 10)
      .head().getString(0)
    assert(top == "planted")
    val same = CorpusDiff.tokenDrift(a, col("text"), a, col("text"), 10)
      .collect().map(_.getDouble(3))
    assert(same.forall(_ == 0.0), "self-drift must be exactly zero")
  }

  test("total KL over the full vocabulary is non-negative on real snapshot halves") {
    val docs = Tables.documents(spark, sfDir)
    val out = CorpusDiff.tokenDrift(
      docs.filter(col("doc_id") % 2 === 0), col("text"),
      docs.filter(col("doc_id") % 2 =!= 0), col("text"), k = 100000)
    val total = out.agg(sum("contrib")).head().getDouble(0)
    assert(total >= 0.0, s"KL total $total")
    assert(out.count() > 10, "vocabulary unexpectedly tiny")
  }
}
