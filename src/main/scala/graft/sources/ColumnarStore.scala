package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Format-parametric columnar release store — [[PartitionedSink]]
  * generalized over the two columnar formats Spark ships natively
  * (parquet and ORC), so a corpus release can target whichever the
  * consuming stack reads, with the SAME scale properties:
  *
  *  - directory partitioning -> partition pruning (a matching filter
  *    reads zero bytes of pruned partitions, `PartitionFilters` in
  *    the scan);
  *  - predicate pushdown -> row-group/stripe skipping
  *    (`PushedFilters` reach both formats' readers);
  *  - STATISTICS-ONLY aggregation — the DataSource V2 read path
  *    answers MIN/MAX/COUNT from file footers without scanning data
  *    (`PushedAggregation` in the scan): at 100 TB, release QC
  *    queries like "row count per shard" or "id range per partition"
  *    become metadata reads.
  *
  * [[readAggPushdown]] opts the session's scan into V2 +
  * aggregate-pushdown for the read (both confs are session-local and
  * restored after plan construction — the V1 path stays the default
  * everywhere else, matching stock Spark). Aggregate pushdown has the
  * engine's own preconditions (no row filter, all-or-nothing per
  * query, MIN/MAX unsupported on some types); the spec pins the plan
  * shape for the supported shapes.
  */
object ColumnarStore {

  val Formats: Set[String] = Set("parquet", "orc")

  private def checked(fmt: String): String = {
    require(Formats.contains(fmt), s"unsupported format: $fmt")
    fmt
  }

  /** Write the release layout: directory-partitioned columnar files. */
  def write(df: DataFrame, path: String, fmt: String,
            partitionCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format(checked(fmt))
    partitionCol.fold(w)(c => w.partitionBy(c)).save(path)
  }

  /** Plain read (V1 path, like every other graft scan). */
  def read(spark: SparkSession, path: String, fmt: String): DataFrame =
    spark.read.format(checked(fmt)).load(path)

  /** Run `body` with the V2 scan + aggregate pushdown enabled for
    * `fmt`, so eligible MIN/MAX/COUNT aggregates planned AND EXECUTED
    * inside are answered from footer statistics. The loan shape
    * matters: pushdown is applied by the optimizer at action time,
    * not at `load()` — a conf changed back before the action would
    * undo it. The loan hands `body` a CLONED session
    * (`spark.newSession()`: same SparkContext, shared catalog/cache,
    * ISOLATED SQLConf) with the two confs flipped there only — so
    * concurrent queries on the caller's session never switch scan
    * paths, overlapping/nested loans cannot restore stale values,
    * and the V1 path stays the default everywhere else, matching
    * stock Spark. Reads inside `body` must go through the session it
    * receives. */
  def withAggPushdown[T](spark: SparkSession, fmt: String)(body: SparkSession => T): T = {
    val f = checked(fmt)
    val loaned = spark.newSession()
    val v1Key = "spark.sql.sources.useV1SourceList"
    val v1Rest = loaned.conf.get(v1Key)
      .split(",").map(_.trim).filter(s => s.nonEmpty && s != f)
    loaned.conf.set(v1Key, v1Rest.mkString(","))
    loaned.conf.set(s"spark.sql.$f.aggregatePushdown", "true")
    body(loaned)
  }
}
