package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Local density (reference: create_frame_summary_features.py:58-62 —
  * the `dens` feature the reference stubs out because its pairwise
  * implementation "doesn't work with large datasets, runs out of
  * memory"). Spark-first replacement: 2-D grid binning; density = bin
  * occupancy. A pure hash aggregate with map-side combine — linear,
  * shuffle-light, and the natural 100 TB formulation (pairwise radius
  * search would be a cartesian join).
  */
object Density {
  def grid(df: DataFrame, keys: Seq[Column], x: Column, y: Column,
           cellW: Double, cellH: Double): DataFrame =
    df.withColumn("gx", floor(x / cellW).cast("long"))
      .withColumn("gy", floor(y / cellH).cast("long"))
      .groupBy(keys :+ col("gx") :+ col("gy"): _*)
      .agg(count(lit(1)).as("n"))
}
