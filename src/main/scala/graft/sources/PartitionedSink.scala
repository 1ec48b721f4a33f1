package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partitioned parquet sink — the layout that makes 100 TB readable:
  * directory-partition by a low-cardinality filter column so reads
  * with a matching predicate prune whole partitions (visible as
  * PartitionFilters in the scan, zero data read for pruned values).
  */
object PartitionedSink {
  def write(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
