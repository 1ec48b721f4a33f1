package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for every left row, the most recent
  * right row with ord_r <= ord_l within the same key. The reference's
  * pipeline aligns every frame observation with the latest preceding
  * configuration/segmentation state (`main.nf:57-90` config snapshots);
  * market-data engines know the same operator as ASOF JOIN.
  *
  * Spark has no native as-of join. Rather than a custom SparkPlan, this
  * composes exactly ONE shuffle: tag and union both sides, then a
  * single (key, ord) window carries the last non-null right payload
  * forward (ignore-nulls last). Equivalent to DuckDB's
  * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ord >= r.ord`, provided
  * `ord` is unique per key (ties resolve right-before-left).
  */
object AsOfJoin {
  /** @param left    left rows (kept in full)
    * @param right   right rows: must have `key`, `ord` and the payload
    *                input columns
    * @param key     equi-join key column name (same name both sides)
    * @param ord     ordering column name (same name both sides; unique)
    * @param payload (rightColumn, outputName) pairs to attach */
  def lastPrior(left: DataFrame, right: DataFrame, key: String, ord: String,
                payload: Seq[(String, String)]): DataFrame = {
    payload.foreach { case (_, out) =>
      require(!left.columns.contains(out),
        s"payload output column '$out' collides with a left column")
    }
    val l = left.withColumn("_tag", lit(1))
    val r = right.select(col(key) +: col(ord) +:
        payload.map { case (in, out) => col(in).as(out) }: _*)
      .withColumn("_tag", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col(ord), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { case (df, (_, out)) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1).drop("_tag")
  }
}
