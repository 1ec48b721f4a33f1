package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic corpus shuffle — the "shuffle the training data"
  * step every corpus build ends with: documents arrive grouped by
  * source/crawl/time, and a dataloader reading shards in order would
  * see that locality as curriculum skew, so the corpus is laid out in
  * a pseudo-random global order before sharding.
  *
  * Semantics (engine-reproducible, no RNG state): each document's
  * shuffle key is the splitmix64 finalizer [[graft.functions.Mix64]]
  * of its id (the Lehmer step the stratified samplers use is LINEAR
  * in the id — under it consecutive ids stay neighbours, which is
  * exactly the locality a shuffle must destroy; the finalizer
  * avalanches), the global order is (key ASC, id ASC), and the
  * ordered corpus splits into `nShards` CONTIGUOUS blocks of
  * ceil(n / nShards) — contiguous so each shard file writes
  * sequentially, with (shard, pos) addressing a document's exact
  * slot, and the block boundaries are a pure function of the global
  * rank (resumable, re-runnable on any partitioning).
  *
  * The global rank is the standard two-level distributed scan (see
  * [[Sharding.assignShards]], which round-robins a SIZE-sorted order
  * for token balance where this operator block-splits a HASH order
  * for randomness): range-partition by the order, per-partition
  * row_number, driver prefix-scan over the width-row count table,
  * broadcast add — no single-task global window anywhere. The corpus
  * total `n` rides out of the same counts collect for free.
  */
object Shuffle {

  /** The shuffle key as a column (shared closed form with the oracle). */
  def shuffleKey(id: Column): Column =
    graft.functions.Mix64(id.cast("long"))

  /** Per-document shuffled layout: (doc_id, shuffle_key, shard, pos).
    * `width` <= 0 uses the session shuffle parallelism. */
  def permute(df: DataFrame, id: Column, nShards: Int,
              width: Int = 0): DataFrame =
    layoutBy(df, id, shuffleKey(id), nShards, width)
      .withColumnRenamed("sort_key", "shuffle_key")

  /** The general form: contiguous (shard, pos) blocks over the global
    * (sortKey ASC, id ASC) order — [[permute]] is this with the Mix64
    * key, and a CURRICULUM export is this with a difficulty score as
    * the key (easy-to-hard ordering the dataloader then reads in shard
    * sequence). Key type must be orderable; ties break on id. */
  def layoutBy(df: DataFrame, id: Column, sortKey: Column, nShards: Int,
               width: Int = 0): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val w =
      if (width > 0) width
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(id.as("doc_id"), sortKey.as("sort_key"))
      .repartitionByRange(w, col("sort_key"), col("doc_id"))
      .withColumn("_part", spark_partition_id())
    val win = Window.partitionBy("_part")
      .orderBy(col("sort_key"), col("doc_id"))
    val local = base.withColumn("_rn", row_number().over(win))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = local.groupBy("_part").agg(max("_rn").as("_n"))
      .collect().map(r => (r.getInt(0), r.getInt(1).toLong)).sortBy(_._1)
    val n = counts.map(_._2).sum
    if (n == 0L) {
      // empty input: derive the empty frame from the computed shape so
      // sort_key keeps the CALLER'S key type (a hardcoded long here
      // would break schema-sensitive downstream unions for double-keyed
      // curriculum layouts)
      val empty = local.select(col("doc_id"), col("sort_key"),
        lit(0L).as("shard"), lit(0L).as("pos")).limit(0)
      local.unpersist()
      return empty
    }
    val shardSize = (n + nShards - 1) / nShards
    val prefix = counts.scanLeft((0, 0L)) { case ((_, acc), (p, c)) =>
      (p, acc + c)
    }
    val prefDf = counts.map(_._1).zip(prefix.map(_._2).init)
      .toSeq.toDF("_part", "_pref")
    // the returned plan is local's last reader: release the cache once
    // the caller materializes it (best-effort — see CacheRelease)
    graft.functions.CacheRelease.afterNextExecution(local)
    local.join(broadcast(prefDf), Seq("_part"))
      .withColumn("_r0", col("_pref") + col("_rn") - 1L)
      .withColumn("shard", expr(s"_r0 div ${shardSize}L")) // integer div, no double rounding
      .withColumn("pos", col("_r0") % lit(shardSize))
      .select("doc_id", "sort_key", "shard", "pos")
  }
}
