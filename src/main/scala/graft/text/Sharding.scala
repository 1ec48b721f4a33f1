package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Token-balanced output sharding: assign every document to one of
  * `nShards` output shards so shard token totals come out nearly even —
  * the step between a packed corpus and the fixed-count shard files a
  * training run reads (the dataloader wants shards of equal work, not
  * equal document counts; a size-skewed corpus round-robined by doc_id
  * can put all the long documents in one file).
  *
  * Semantics (deterministic, engine-reproducible, mirrored by the
  * oracle): rank documents by (n_tokens DESC, doc_id ASC) and assign
  * shard = (rank - 1) mod nShards — round-robin over the size-sorted
  * corpus, the classic LPT-style approximation. Because consecutive
  * ranks go to distinct shards, any two shard token totals differ by at
  * most the LARGEST single document (each round of nShards consecutive
  * ranks gives every shard one document, and the per-round differences
  * telescope) — spec-asserted, no balance measurement loop needed.
  *
  * The global rank is the same two-level distributed scan as
  * [[Packing.chunkSpans]] (a bare `row_number() over (order by ...)`
  * window is a single-task sort — a non-starter at corpus scale):
  * range-partition by the rank order, per-partition `row_number`
  * (parallel), collect the per-partition COUNTS (width rows, corpus-
  * size-independent), prefix-scan on the driver, broadcast back for a
  * map-side add. Rank depends only on the global order — ties fully
  * broken by doc_id — so the result is invariant to `width` and range
  * boundary placement (spec-pinned).
  */
object Sharding {

  /** Per-document shard assignment: (doc_id, n_tokens, shard).
    * `width` <= 0 uses the session shuffle parallelism. */
  def assignShards(df: DataFrame, id: Column, nTokens: Column, nShards: Int,
                   width: Int = 0): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val w =
      if (width > 0) width
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .repartitionByRange(w, col("n_tokens").desc, col("doc_id"))
      .withColumn("_part", spark_partition_id())
    val win = Window.partitionBy("_part")
      .orderBy(col("n_tokens").desc, col("doc_id"))
    // persist before the counts collect so the partition ids the prefix
    // table was built from are exactly the ones joined against
    val local = base.withColumn("_rn", row_number().over(win))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = local.groupBy("_part").agg(max("_rn").as("_n"))
      .collect().map(r => (r.getInt(0), r.getInt(1).toLong)).sortBy(_._1)
    val prefix = counts.scanLeft((0, 0L)) { case ((_, acc), (p, n)) =>
      (p, acc + n)
    }
    val prefDf = counts.map(_._1).zip(prefix.map(_._2).init)
      .toSeq.toDF("_part", "_pref") // part -> ranks before it
    // the returned plan is local's last reader (best-effort cleanup)
    graft.functions.CacheRelease.afterNextExecution(local)
    local.join(broadcast(prefDf), Seq("_part"))
      .withColumn("shard",
        (col("_pref") + col("_rn") - 1L) % lit(nShards.toLong))
      .select("doc_id", "n_tokens", "shard")
  }

  /** Per-shard balance summary over [[assignShards]] output. */
  def shardStats(assign: DataFrame): DataFrame =
    assign.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
}
