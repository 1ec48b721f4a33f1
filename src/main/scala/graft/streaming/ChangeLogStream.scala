package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** One CDC change: key, a two-part version (the natural (ts-like,
  * unique-id) pair — unique per key by the [[graft.operators.ChangeLog]]
  * contract), the operation ('D' = delete, anything else upserts),
  * and the payload. */
case class CdcEvent(id: Long, ver1: Long, ver2: Long, op: String,
                    payload: String)

/** Per-key state and emission: the key's current winning row. `live`
  * is false when the latest operation is a delete — the key is out of
  * the snapshot but the emission still rides so sinks can retract. */
case class CdcState(ver1: Long, ver2: Long, op: String, payload: String)
case class CdcCurrent(id: Long, ver1: Long, ver2: Long, live: Boolean,
                      payload: String)

/** STREAMING CDC latest-state maintenance — the unbounded form of
  * [[graft.operators.ChangeLog.snapshot]]: each arriving change
  * max-merges into its key's state on the (ver1, ver2) order and the
  * key's new CURRENT row is emitted (update mode — one row per
  * touched key per micro-batch, the changelog a downstream
  * materialized view consumes).
  *
  * The state is a MAX over a total order — a join-semilattice — so
  * arrival order across micro-batches cannot change the result and a
  * replayed change is absorbed idempotently (max(x, x) = x): the
  * final state equals the batch snapshot over the same log, which is
  * the spec's parity pin. State per key is ONE row regardless of
  * history length — the streaming twin never holds the history the
  * batch aggregate's map-side partial also avoids shuffling. */
object ChangeLogStream {

  def snapshotStream(log: Dataset[CdcEvent]): Dataset[CdcCurrent] = {
    import log.sparkSession.implicits._
    log.groupByKey(_.id)
      .mapGroupsWithState[CdcState, CdcCurrent](GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[CdcEvent], state: GroupState[CdcState]) =>
          val best = (state.getOption.iterator ++
            rows.map(e => CdcState(e.ver1, e.ver2, e.op, e.payload)))
            .maxBy(s => (s.ver1, s.ver2))
          state.update(best)
          CdcCurrent(id, best.ver1, best.ver2, best.op != "D", best.payload)
      }
  }

  /** MATERIALIZED changelog store — the write-side completion of the
    * CDC family (30s2 batch snapshot, 30s3 streaming state): each
    * micro-batch of changes merges into a parquet store partitioned
    * by `bucket = pmod(id, nBuckets)`, rewriting ONLY the buckets the
    * batch touches (dynamic-partition overwrite — the 27m2/21w
    * file-idempotence pattern):
    *  1. touched buckets = the batch's distinct key buckets;
    *  2. the store's touched buckets read back PARTITION-PRUNED
    *     (work scales with the batch's key spread, never the store);
    *  3. [[graft.operators.ChangeLog.snapshot]] over stored rows ∪
    *     batch changes picks each key's max version; a key whose
    *     latest op is a delete leaves its bucket;
    *  4. the surviving rows overwrite exactly the touched bucket
    *     partitions.
    * The store keeps each key's winning (ver1, ver2, op='U' implied
    * by presence) so merges are max-version idempotent: a REPLAYED
    * micro-batch recomputes the same bucket contents byte-for-byte
    * (the semilattice argument of [[snapshotStream]], now on files).
    * At corpus scale the bucket count trades write amplification
    * (batch keys per bucket) against small-file pressure — compaction
    * is the 35 story, as for the IVF delta. */
  def materialize(log: Dataset[CdcEvent], storeDir: String,
                  checkpointDir: String, nBuckets: Int): StreamingQuery = {
    require(nBuckets >= 1)
    log.toDF().writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch(materializeBatch(storeDir, nBuckets) _)
      .start()
  }

  /** The foreachBatch handler (exposed for the spec's replay pin). */
  def materializeBatch(storeDir: String, nBuckets: Int)
                      (batch: org.apache.spark.sql.DataFrame,
                       batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val b = batch.withColumn("bucket",
      pmod(col("id"), lit(nBuckets)).cast("int"))
    val touched = b.select("bucket").distinct()
    val existing =
      if (new java.io.File(s"$storeDir/_started").exists())
        spark.read.parquet(storeDir)
          .join(broadcast(touched), Seq("bucket"), "left_semi")
          .withColumn("op", lit("U"))
      else b.limit(0)
    val merged = graft.operators.ChangeLog.snapshot(
        existing.unionByName(b), Seq("id"), Seq("ver1", "ver2"), "op")
      .select(col("id"), col("ver1"), col("ver2"), col("payload"),
        col("bucket"))
    // re-root on a persisted RDD before the overwrite: the merged plan
    // READS the same path the write overwrites, which Spark rightly
    // rejects without the truncation (and lazily racing the two would
    // be wrong anyway)
    val (snap, snapRdd) = graft.operators.Rounds.materialize(merged,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    snapRdd.count()
    snap.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(storeDir)
    // dynamic overwrite only rewrites partitions PRESENT in the output:
    // a touched bucket whose every key was deleted writes nothing, so
    // its stale files must go explicitly or deleted keys resurface
    val nonEmpty = snap.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    touched.collect().map(_.getInt(0)).filterNot(nonEmpty).foreach { bk =>
      val dir = new java.io.File(s"$storeDir/bucket=$bk")
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
        f.delete(); ()
      }
      if (dir.exists()) rm(dir)
    }
    snapRdd.unpersist(blocking = false)
    // the marker makes first-batch bootstrap explicit (an empty dir
    // is not a readable parquet table); created AFTER the first write
    new java.io.File(s"$storeDir/_started").createNewFile()
    ()
  }
}
