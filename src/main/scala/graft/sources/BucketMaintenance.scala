package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance for `bucket=`-partitioned parquet stores (the BM25
  * postings index, the CDC changelog store, the IVF delta): every
  * incremental append adds one small part per touched bucket, so at
  * crawl cadence a bucket accumulates thousands of tiny files whose
  * open/footer overhead eventually dominates reads. Compaction
  * rewrites each FRAGMENTED bucket (>= `minParts` data files) into a
  * single file, leaving row contents untouched — serving over a
  * compacted store is bit-identical by construction.
  *
  * Scale shape: the census is a filesystem listing (no data read);
  * only fragmented buckets are scanned (the same static partition
  * pruning serving uses); each rewritten bucket's rows hash to one
  * task (`repartition` on the partition column) so the dynamic
  * overwrite emits exactly one file per bucket, and intact buckets'
  * files are never touched. Single concurrent maintainer per store by
  * contract — the same serialization the appenders already assume.
  */
object BucketMaintenance {

  /** Bucket partition values under `tableDir` fragmented into at least
    * `minParts` data files. */
  def fragmentedBuckets(spark: SparkSession, tableDir: String,
                        minParts: Int): Seq[Int] = {
    require(minParts >= 2, "minParts < 2 would rewrite intact buckets")
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .flatMap { d =>
        val parts = fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        if (parts >= minParts)
          Some(d.getPath.getName.stripPrefix("bucket=").toInt)
        else None
      }
  }

  /** Rewrite the given buckets of `tableDir` in place, one file per
    * bucket, applying `transform` to the rows first (identity for pure
    * compaction; a filter for retirement). Buckets whose transformed
    * row set is EMPTY have their partition directory deleted outright
    * — a dynamic overwrite never rewrites a partition it emits no rows
    * for, so without the delete a fully-retired bucket would keep its
    * stale files. */
  def rewriteBuckets(spark: SparkSession, tableDir: String,
                     buckets: Seq[Int],
                     transform: DataFrame => DataFrame = identity): Unit =
    stageRewrite(spark, tableDir, buckets, transform)
      .foreach(publishRewrite(spark, _))

  /** A fully materialized bucket rewrite awaiting publication: the
    * transformed rows live in a persisted RDD snapshot, so the
    * original bucket files are no longer read by anything — which is
    * what lets `CommitLog.rewritingStaged` DISPLACE them by rename
    * (metadata-only undo backup) instead of copying them. */
  final case class StagedRewrite private[sources] (
      tableDir: String, buckets: Seq[Int], snap: DataFrame,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      kept: Set[Int])

  /** Phase 1 of [[rewriteBuckets]]: read + transform + MATERIALIZE the
    * given buckets while the store is intact. None when there is
    * nothing to rewrite. */
  def stageRewrite(spark: SparkSession, tableDir: String,
                   buckets: Seq[Int],
                   transform: DataFrame => DataFrame = identity)
      : Option[StagedRewrite] = {
    if (buckets.isEmpty) return None
    val df = transform(
        spark.read.parquet(tableDir).filter(col("bucket").isin(buckets: _*)))
      .repartition(col("bucket"))
    // re-root on a persisted RDD: the plan reads the path the write
    // overwrites (the materializeBatch pattern)
    val (snap, rdd) = graft.operators.Rounds.materialize(df,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    val kept = snap.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet // bounded by |buckets|
    Some(StagedRewrite(tableDir, buckets, snap, rdd, kept))
  }

  /** Phase 2: write the staged rows back (dynamic partition
    * overwrite), release the snapshot, and drop bucket dirs whose
    * transformed row set is empty (a dynamic overwrite never rewrites
    * a partition it emits no rows for — without the delete a
    * fully-retired bucket would keep its stale files; under the
    * staged journal the originals are already displaced and the
    * delete is a no-op). */
  def publishRewrite(spark: SparkSession, s: StagedRewrite): Unit = {
    s.snap.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(s.tableDir)
    s.rdd.unpersist(blocking = false)
    val root = new org.apache.hadoop.fs.Path(s.tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    s.buckets.filterNot(s.kept).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"bucket=$b"), true)
    }
  }

  /** Compact every fragmented bucket to one file. Idempotent; row
    * contents never change. */
  def compact(spark: SparkSession, tableDir: String,
              minParts: Int = 2): Unit =
    rewriteBuckets(spark, tableDir,
      fragmentedBuckets(spark, tableDir, minParts))
}
