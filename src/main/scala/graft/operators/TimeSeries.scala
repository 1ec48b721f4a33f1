package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Numeric._

/** Time-series features from the CellPhe trajectory stage
  * (reference: bin/time_series_features.py + the CellPhe package's
  * `time_series_features`): per track × variable — elevation metrics
  * (ascent/descent), extrema, and Haar wavelet detail energies.
  *
  * Wavelets are computed without collecting a track to one row: rows get
  * a pair index from row_number, detail/approximation coefficients are
  * 2-row aggregates, and level-2 repeats the trick on level-1 output.
  * Everything stays a hash aggregate with map-side combine.
  */
object TimeSeries {

  /** Ascent/descent/extrema per entity (CellPhe elevation variables). */
  def elevation(df: DataFrame, entity: String, ord: Column, v: Column): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(ord)
    df.withColumn("_v", v)
      .withColumn("_d", col("_v") - lag(col("_v"), 1).over(w))
      .groupBy(col(entity))
      .agg(
        count(lit(1)).as("n_obs"),
        dsum(when(col("_d") > 0, col("_d")).otherwise(0.0), 6).as("ascent"),
        dsum(when(col("_d") < 0, -col("_d")).otherwise(0.0), 6).as("descent"),
        round(max(col("_v")), 4).as("max_v"),
        round(min(col("_v")), 4).as("min_v"),
        round(max(col("_v")) - min(col("_v")), 4).as("range_v"))
  }

  /** Haar wavelet detail energies, levels 1-2: mean of squared detail
    * coefficients per entity. d1_i = (v_{2i-1} - v_{2i})/sqrt(2) over
    * the time-ordered series; level 2 runs on the level-1 approximation
    * coefficients a1_i = (v_{2i-1} + v_{2i})/sqrt(2). Incomplete tail
    * pairs are dropped (count = 2 guard). */
  def haarEnergies(df: DataFrame, entity: String, ord: Column, v: Column): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(ord)
    val sqrt2 = sqrt(lit(2.0))
    val rows = df.withColumn("_v", v).withColumn("_rn", row_number().over(w))
    val lvl1 = rows
      .withColumn("_pair", floor((col("_rn") - 1) / 2))
      .withColumn("_signed", when(col("_rn") % 2 === 1, col("_v")).otherwise(-col("_v")))
      .groupBy(col(entity), col("_pair"))
      .agg(count(lit(1)).as("_cnt"),
        (sum(col("_signed")) / sqrt2).as("_d1"),
        (sum(col("_v")) / sqrt2).as("_a1"))
      .filter(col("_cnt") === 2)
    val lvl2 = lvl1
      .withColumn("_ppair", floor(col("_pair") / 2))
      .withColumn("_signed2", when(col("_pair") % 2 === 0, col("_a1")).otherwise(-col("_a1")))
      .groupBy(col(entity), col("_ppair"))
      .agg(count(lit(1)).as("_cnt2"), (sum(col("_signed2")) / sqrt2).as("_d2"))
      .filter(col("_cnt2") === 2)
      .groupBy(col(entity))
      .agg(count(lit(1)).as("n_pairs_l2"),
        round(dsum(col("_d2") * col("_d2"), 8) / count(lit(1)), 6).as("l2_energy"))
    val e1 = lvl1.groupBy(col(entity))
      .agg(count(lit(1)).as("n_pairs_l1"),
        round(dsum(col("_d1") * col("_d1"), 8) / count(lit(1)), 6).as("l1_energy"))
    e1.join(lvl2, Seq(entity), "left")
      .na.fill(0L, Seq("n_pairs_l2")).na.fill(0.0, Seq("l2_energy"))
  }
}
