package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned parquet sink — the layout that makes 100 TB readable:
  * directory-partition by a low-cardinality filter column so reads
  * with a matching predicate prune whole partitions (visible as
  * PartitionFilters in the scan, zero data read for pruned values).
  */
object PartitionedSink {
  // the parquet special case of the format-parametric store — ONE
  // implementation of release-write semantics (see ColumnarStore)
  def write(df: DataFrame, path: String, partitionCol: String): Unit =
    ColumnarStore.write(df, path, "parquet", Some(partitionCol))

  def read(spark: SparkSession, path: String): DataFrame =
    ColumnarStore.read(spark, path, "parquet")
}
