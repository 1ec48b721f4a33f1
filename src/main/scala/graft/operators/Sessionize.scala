package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Track assignment as gap-based sessionization — the tabular analogue
  * of TrackMate's track building (reference: bin/parse_xml.py:120-168
  * assigns a fresh TRACK_ID whenever a lineage breaks). A new session
  * starts when the time gap to the previous observation of the same
  * entity exceeds `gapSeconds`. Two windows over one (entity, ord)
  * partitioning; single shuffle.
  */
object Sessionize {
  def apply(df: DataFrame, entity: String, ord: Column, tsSec: Column,
            gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(ord)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_ts_s", tsSec)
      .withColumn("_gap", col("_ts_s") - lag(col("_ts_s"), 1).over(w))
      .withColumn("_new", when(col("_gap").isNull || col("_gap") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new")).over(wAll))
  }
}
