package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap interpolation — the CellPhe time-series stage interpolates
  * missing frames in a track before computing trajectory features
  * (cellphe `time_series_features`; tracks routinely skip frames after
  * QC filtering). Distributed formulation: per entity, densify the
  * frame axis with sequence+explode (no driver loop), then linearly
  * interpolate between the last/next observed values with
  * ignore-null window frames. One shuffle on the entity key.
  *
  * Frames with multiple observations take the minimum — exact and
  * order-independent (a mean of k observations terminates at a decimal
  * boundary whenever k divides a power of 10, and boundary doubles
  * round differently across engines: Spark rounds the shortest decimal
  * representation, DuckDB rounds in binary).
  */
object GapFill {
  def linear(df: DataFrame, entity: String, frame: Column, v: Column): DataFrame = {
    val obs = df.groupBy(col(entity), frame.as("frame"))
      .agg(min(v).as("v_obs"))
    val span = obs.groupBy(col(entity))
      .agg(min(col("frame")).as("_f0"), max(col("frame")).as("_f1"))
    val dense = span
      .select(col(entity), explode(sequence(col("_f0"), col("_f1"))).as("frame"))
      .join(obs, Seq(entity, "frame"), "left")
    val wPrev = Window.partitionBy(col(entity)).orderBy(col("frame"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(entity)).orderBy(col("frame"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevV = last(col("v_obs"), ignoreNulls = true).over(wPrev)
    val prevF = last(when(col("v_obs").isNotNull, col("frame")), ignoreNulls = true).over(wPrev)
    val nextV = first(col("v_obs"), ignoreNulls = true).over(wNext)
    val nextF = first(when(col("v_obs").isNotNull, col("frame")), ignoreNulls = true).over(wNext)
    dense
      .withColumn("is_observed", col("v_obs").isNotNull)
      .withColumn("v_fill",
        when(col("v_obs").isNotNull, col("v_obs"))
          .otherwise(prevV + (nextV - prevV) *
            (col("frame") - prevF).cast("double") / (nextF - prevF).cast("double")))
      .select(col(entity), col("frame"), graft.functions.Numeric.cround(col("v_fill"), 4).as("v_fill"),
        col("is_observed"))
  }
}
