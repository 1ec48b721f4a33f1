package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed keys. A hot key that would
  * pin one reducer is split across `salts` partial groups (salt =
  * deterministic hash of a high-cardinality column), partially
  * aggregated, then merged. AQE's skew handling covers joins; this is
  * the aggregation-side equivalent, expressed with algebraic partials
  * (sum/count/min/max) so the two-phase result is exactly the one-phase
  * result.
  */
object SkewAgg {
  def saltedStats(df: DataFrame, key: String, saltFrom: Column, salts: Int,
                  v: Column): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sum(v.cast("decimal(28,4)")).as("_s"),
        min(v).as("_mn"), max(v).as("_mx"))
    partial.groupBy(col(key))
      .agg(sum(col("_n")).as("n"),
        sum(col("_s")).cast("double").as("v_sum"),
        min(col("_mn")).as("v_min"), max(col("_mx")).as("v_max"))
  }
}
