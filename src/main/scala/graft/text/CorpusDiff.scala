package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-drift comparison — the monitoring step between two corpus
  * snapshots (yesterday's crawl vs today's, raw vs filtered, shard vs
  * shard): the add-one-smoothed token distributions of the two corpora
  * are compared term-by-term, and the per-token KL contribution
  * `pA * ln(pA / pB)` names WHICH tokens drove the drift — the
  * drift report a corpus build actually reads (total KL alone says
  * "something changed"; the top contributions say what).
  *
  * Scale shape: one token-grain hash aggregate per corpus (map-side
  * combined — the only corpus-sized shuffles), a full outer join of
  * the two VOCABULARY tables (token grain, orders of magnitude
  * smaller than the corpora), smoothing over the union vocabulary so
  * a token absent from one side contributes finitely, and a
  * TakeOrdered top-k so only k rows reach the driver. */
object CorpusDiff {

  private def counts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(lower(text), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Top-`k` drift contributions between corpus A and corpus B, ranked
    * by the (signed) KL term descending — the tokens most
    * over-represented in A relative to B first; ties break on token.
    * Columns: token, cnt_a, cnt_b, contrib. The TOTAL divergence is
    * the sum of contrib over the whole vocabulary (returned here over
    * the top-k slice; pass k >= vocabulary size for the exact total). */
  def tokenDrift(a: DataFrame, aText: Column,
                 b: DataFrame, bText: Column, k: Int = 100): DataFrame = {
    val ca = counts(a, aText).withColumnRenamed("cnt", "cnt_a")
    val cb = counts(b, bText).withColumnRenamed("cnt", "cnt_b")
    val joined = ca.join(cb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    // totals + union-vocabulary size ride as a broadcast one-row
    // aggregate (no driver-side count; the query stays one lazy job)
    val tot = joined.agg(sum(col("cnt_a")).as("_na"),
      sum(col("cnt_b")).as("_nb"), count(lit(1)).as("_v"))
    joined.crossJoin(broadcast(tot))
      .withColumn("_pa", (col("cnt_a") + lit(1.0)) / (col("_na") + col("_v")))
      .withColumn("_pb", (col("cnt_b") + lit(1.0)) / (col("_nb") + col("_v")))
      .withColumn("contrib", graft.functions.Numeric.cround(
        col("_pa") * log(col("_pa") / col("_pb")), 8))
      .orderBy(col("contrib").desc, col("token"))
      .limit(k)
      .select("token", "cnt_a", "cnt_b", "contrib")
  }
}
