package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass data profiling — the per-column QC table every ingest
  * lands with: row/null/distinct counts, min/max, and the top-k most
  * frequent values of EVERY profiled column.
  *
  * Scale shape: one `stack`-style explode to (column, value) pairs and
  * ONE value-grain shuffle serves every statistic for every column —
  * the naive per-column pass (k scans) or multi-count-distinct plan
  * (an Expand blowup shuffling the corpus k ways for the distincts
  * PLUS a scan per top-k) does strictly more work; here distincts,
  * null mass, min/max and the frequency heads all read the same
  * (column, value, n) aggregate, and the only full-data exchange is
  * that one map-side-combined count. Values profile as strings
  * (binary collation in both engines — what makes min/max exactly
  * oracle-replayable); numeric-typed profiling stays a typed query
  * away and is not this table's job. */
object Profile {

  /** Profile `cols` of `df`: one row per column. */
  def profile(df: DataFrame, cols: Seq[String], topK: Int = 3): DataFrame = {
    require(cols.nonEmpty && topK >= 1)
    val kv = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("e"))
      .select(col("e.c").as("c"), col("e.v").as("v"))
    val counts = kv.groupBy("c", "v").agg(count(lit(1)).as("n"))
    val stats = counts.groupBy("c").agg(
      sum("n").as("n_rows"),
      sum(when(col("v").isNull, col("n")).otherwise(0L)).as("n_null"),
      count(when(col("v").isNotNull, 1)).as("n_distinct"),
      min("v").as("min_v"), max("v").as("max_v"))
    val top = counts.filter(col("v").isNotNull)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("c").orderBy(col("n").desc, col("v"))))
      .filter(col("_rn") <= topK)
      .groupBy("c")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("_rn"), col("v")))),
        e => e("v")), ",").as("top_values"))
    stats.join(top, Seq("c"), "left")
      .select(col("c").as("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"),
        coalesce(col("top_values"), lit("")).as("top_values"))
  }
}
