package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap interpolation — the CellPhe time-series stage interpolates
  * missing frames in a track before computing trajectory features
  * (cellphe `time_series_features`; tracks routinely skip frames after
  * QC filtering). Distributed formulation: per entity, each observed
  * frame emits its gap segment [frame, next observed frame) via
  * lead + sequence-explode, interpolating linearly inside the segment
  * — TWO shuffles total (observation dedup, lead window) and no join.
  * The r1 formulation densified the whole frame axis and ran
  * ignore-null windows over it, paying a third shuffle plus a join of
  * the dense axis against the observations; the interpolated values
  * are bit-identical (same pv + (nv-pv)*(f-pf)/(nf-pf) IEEE
  * arithmetic), so the DuckDB oracle — which still uses the dense
  * ignore-null-window formulation — is unchanged.
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
    val w = Window.partitionBy(col(entity)).orderBy(col("frame"))
    obs
      .withColumn("_nf", lead(col("frame"), 1).over(w))
      .withColumn("_nv", lead(col("v_obs"), 1).over(w))
      .withColumnRenamed("frame", "_f")
      // the last observation has no next segment; it emits itself
      .withColumn("frame", explode(sequence(col("_f"), coalesce(col("_nf") - 1, col("_f")))))
      .withColumn("is_observed", col("frame") === col("_f"))
      .withColumn("v_fill",
        when(col("is_observed"), col("v_obs"))
          .otherwise(col("v_obs") + (col("_nv") - col("v_obs")) *
            (col("frame") - col("_f")).cast("double") / (col("_nf") - col("_f")).cast("double")))
      .select(col(entity), col("frame"), graft.functions.Numeric.cround(col("v_fill"), 4).as("v_fill"),
        col("is_observed"))
  }
}
