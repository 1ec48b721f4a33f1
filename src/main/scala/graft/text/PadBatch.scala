package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Length-bucketed batching report — the dynamic-batching planner's
  * input: documents grouped into sequence-length buckets (each bucket
  * pads to its bound), with the padding efficiency each bucket
  * achieves. The standard alternative to plain fixed-length batching,
  * where one long outlier pads every short neighbour to the max; a
  * training pipeline picks bucket bounds from this table (and 31f's
  * packing is the zero-padding alternative — the two trade shuffle
  * cost against padding waste).
  *
  * Map-only bucket assignment (a when-chain over the bounds) into one
  * map-side-combined aggregate; |buckets| output rows. Documents
  * longer than the last bound land in the last bucket (their padded
  * size counts the true length, i.e. they would be truncated-or-split
  * upstream — the report makes that mass visible as efficiency > 1
  * never happens: padded counts max(len, bound)). */
object PadBatch {

  def bucketStats(df: DataFrame, id: Column, nTokens: Column,
                  bounds: Seq[Long]): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.distinct == bounds,
      s"bounds must be ascending and distinct: $bounds")
    val n = nTokens.cast("long")
    val bucket = bounds.init.foldRight(lit(bounds.last): Column) { (b, rest) =>
      when(n <= b, lit(b)).otherwise(rest)
    }
    df.select(id.as("doc_id"), n.as("_n"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_n")).as("n_tokens"),
        sum(greatest(col("_n"), col("bucket"))).as("padded_tokens"))
      .withColumn("efficiency", graft.functions.Numeric.cround(
        col("n_tokens").cast("double") / col("padded_tokens"), 6))
  }
}
