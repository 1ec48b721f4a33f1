package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew-join handling — the other half of the skew story
  * next to SkewAgg's salting: when one join key dominates (hot frames,
  * boilerplate documents), AQE splits the oversized shuffle partition
  * into parallel sub-joins at runtime instead of stalling one task.
  * This spec pins that the engine actually does it (final plan marks
  * the join skew=true) and that results are unchanged — the behaviour
  * the 100 TB design delegates to AQE rather than hand-salting every
  * join.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed shuffle-join partition, result unchanged") {
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // 95% of fact rows share key 0 — one shuffle partition dwarfs the rest
      val fact = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id") % 50).as("k"),
          col("id").as("v"))
      val dim = spark.range(50).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = fact.join(dim, Seq("k"))
      val n = joined.collect().length.toLong // materializes THIS plan (AQE finalizes it)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "expected AQE to mark the join skewed:\n" + plan.take(1500))
      assert(n == 200000L, s"skew-split join changed the row count: $n")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }
}
