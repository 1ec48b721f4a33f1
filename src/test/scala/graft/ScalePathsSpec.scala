package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewAgg
import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {
  test("bucketed join is exchange-free") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
      Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
      Bucketing.writeBucketed(o, "o_b", "o_orderkey", 8)
      val joined = Bucketing.read(spark, "li_b")
        .join(Bucketing.read(spark, "o_b"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join should not shuffle:\n" + plan.take(1200))
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct within rsd bound; quantile sketch brackets the median") {
    val ev = Tables.events(spark, sfDir)
    val r = graft.operators.Sketches.approxStats(ev, Seq(col("event_type")),
        col("user_id"), col("value"))
      .select("approx_distinct", "exact_distinct", "p50", "p95")
      .as[(Long, Long, Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (approx, exact, p50, p95) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.10,
        s"HLL error too large: $approx vs $exact")
      assert(p50 <= p95)
      assert(p50 > 0.0 && p50 < 330.0)
    }
  }
}

class SkewAggSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals direct aggregation") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("v_sum"),
        min(col("value")).as("v_min"), max(col("value")).as("v_max"))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    val salted = SkewAgg.saltedStats(ev, "event_type", col("event_id"), 16, col("value"))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(salted == direct)
  }
}
