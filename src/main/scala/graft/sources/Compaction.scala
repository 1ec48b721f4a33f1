package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-files compaction — the tabular analogue of the reference's
  * frame re-stacking (`main.nf:376` `create_tiff_stack` packs thousands
  * of per-frame files back into one artifact). At 100 TB the same
  * problem appears as millions of small parquet files from fine-grained
  * ingestion; compaction rewrites them into `targetFiles` outputs with
  * `maxRecordsPerFile` as the safety bound.
  */
object Compaction {
  def compact(df: DataFrame, path: String, targetFiles: Int,
              maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(targetFiles)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
