package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRule

/** [[graft.plans.RangeJoinRule]]: the injected optimizer rule must turn
  * an inequality-only inner join (stock plan: BroadcastNestedLoopJoin /
  * cartesian) into a binned equi-join with identical results, leave
  * equi-keyed joins alone, and stay inert when its conf is unset.
  * TestSession registers graft.plans.GraftExtensions, so the rule is
  * present in every suite; these tests toggle the bin conf. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withBin[A](w: String)(f: => A): A = {
    spark.conf.set(RangeJoinRule.BinConf, w)
    try f finally spark.conf.unset(RangeJoinRule.BinConf)
  }

  private def facts: DataFrame =
    Seq((1L, 0.0), (2L, 49.9), (3L, 50.0), (4L, 120.0), (5L, 999.9),
      (6L, 1000.0), (7L, -3.0)).toDF("id", "v")
  private def tiers: DataFrame =
    Seq((0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1000.0, "high"))
      .toDF("lo", "hi", "tier")

  private def naive: DataFrame =
    facts.join(tiers, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "tier")

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewritten join matches the nested-loop result, boundaries exact") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = withBin("50") {
      naive.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    }
    assert(got === expected)
    // hi is exclusive: 50.0 is mid, not low; 1000.0 matches nothing
    assert(got.contains((3L, "mid")) && !got.contains((3L, "low")))
    assert(!got.exists(_._1 == 6L) && !got.exists(_._1 == 7L))
  }

  test("rule replaces the nested-loop join with a binned equi-join") {
    val off = physical(naive)
    assert(off.contains("BroadcastNestedLoopJoin"),
      s"expected stock BNLJ plan, got:\n$off")
    val on = withBin("50")(physical(naive))
    assert(!on.contains("BroadcastNestedLoopJoin") && !on.contains("CartesianProduct"),
      s"rule did not rewrite:\n$on")
    assert(on.contains("_graft_bin"), s"no bin key in:\n$on")
  }

  test("SQL BETWEEN join gets the same rewrite") {
    facts.createOrReplaceTempView("rjr_facts")
    tiers.createOrReplaceTempView("rjr_tiers")
    val q = "SELECT f.id, t.tier FROM rjr_facts f JOIN rjr_tiers t " +
      "ON f.v BETWEEN t.lo AND t.hi"
    val expected = spark.sql(q).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    withBin("50") {
      val df = spark.sql(q)
      assert(!physical(df).contains("BroadcastNestedLoopJoin"))
      // BETWEEN is inclusive both ends: 50.0 hits low AND mid here
      val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === expected)
      assert(got.contains((3L, "low")) && got.contains((3L, "mid")))
    }
  }

  test("equi-keyed joins and non-inner joins are left alone") {
    val l = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x")
    val r = Seq((1L, 0.0, 15.0), (2L, 15.0, 30.0)).toDF("k", "lo", "hi")
    withBin("10") {
      val equi = l.join(r, l("k") === r("k") && l("x") >= r("lo") && l("x") < r("hi"))
      assert(!physical(equi).contains("_graft_bin"))
      assert(equi.count() === 2)
      val outer = l.join(r, l("x") >= r("lo") && l("x") < r("hi"), "left")
        .select(l("k"), r("k"))
      assert(!physical(outer).contains("_graft_bin"))
    }
  }

  test("degenerate intervals: lo > hi and null bounds match nothing") {
    val bad = Seq((Option(0.0), Option(-10.0), "inverted"),
        (Option.empty[Double], Option(50.0), "nulllo"))
      .toDF("lo", "hi", "tier")
    withBin("50") {
      val joined = facts.join(bad, col("v") >= col("lo") && col("v") < col("hi"))
      assert(physical(joined).contains("_graft_bin"))
      assert(joined.count() === 0)
    }
  }

  test("matches the manual RangeJoin.binned operator row-for-row") {
    val manual = operators.RangeJoin.binned(facts.select(col("id"), col("v")),
        tiers, col("v"), 50.0)
      .select("id", "tier").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val ruled = withBin("50")(naive.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    assert(ruled === manual)
  }
}
