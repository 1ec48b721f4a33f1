package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table plumbing — the shuffle-elimination path for repeated
  * co-located joins at 100 TB: write both join sides bucketed+sorted on
  * the join key, and every subsequent equi-join on that key is
  * exchange-free (SortMergeJoin reads co-located buckets directly).
  * Locally this uses the session catalog's warehouse; on a cluster the
  * same API targets the metastore.
  */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
