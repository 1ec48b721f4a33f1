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
  /** events.ts is TIMESTAMP(NANOS) parquet; with NanosConf it loads as
    * a nanosecond long, converted here to TimestampType by truncating
    * to microseconds (floor division — matches DuckDB's epoch_us). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
