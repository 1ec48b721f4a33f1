package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — at 100 TB the dominant join cost
  * is shuffling fact rows that the other side will discard; Spark's
  * runtime filter (spark.sql.optimizer.runtime.bloomFilter) builds a
  * bloom filter from the selective (creation) side and pushes a
  * might_contain probe below the fact-side shuffle, dropping
  * non-matching rows before they cross the wire. This spec pins the
  * engine behaviour the scale design relies on: with broadcast off
  * (forcing a shuffle join, the 100 TB regime) and a selective dim
  * filter, the optimizer injects the bloom probe on the fact side, and
  * the join result is unchanged.
  */
class BloomJoinSpec extends SparkSpec {

  test("selective shuffle join gets a runtime bloom filter on the fact side") {
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "50MB")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      val ord = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        "expected a runtime bloom filter probe in the optimized plan:\n" + plan.take(1500))
      // correctness unchanged vs the unfiltered plan
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val n2 = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == n2, s"bloom-filtered join changed the result: $n vs $n2")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    }
  }
}
