package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session config required to read the TIMESTAMP(NANOS) parquet the
    * driver generates: Spark has no nanosecond timestamp type, so nanos
    * arrive as LongType and `events` converts to a µs timestamp. */
  val NanosConf: (String, String) = ("spark.sql.legacy.parquet.nanosAsLong", "true")

  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  /** events.ts has been TIMESTAMP(NANOS) or µs TIMESTAMP_NTZ across
    * driver testdata generations; normalize both to TimestampType —
    * nanos (a long under NanosConf) truncate to µs by floor division
    * (matches DuckDB's epoch_us), NTZ casts losslessly under the UTC
    * session timezone every entry point pins. TimestampType (not NTZ)
    * is required by streaming event-time watermarks downstream. */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(colName,
          col(colName).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
