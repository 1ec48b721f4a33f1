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
    *  1. touched buckets = the batch's distinct key buckets,
    *     collected driver-side (bounded by nBuckets) and applied as
    *     an `isin` filter so the store read is STATICALLY
    *     partition-pruned — work scales with the batch's key spread,
    *     never the store;
    *  2. [[graft.operators.ChangeLog.latest]] over stored ∪ arriving
    *     rows picks each key's max version, KEEPING delete
    *     tombstones: a deleted key's (id, version, 'D') row stays in
    *     its bucket so a STALE out-of-order upsert arriving in a
    *     later batch finds the higher-versioned delete and loses —
    *     without the tombstone it would win unopposed and silently
    *     resurrect the key. Tombstones also keep touched buckets
    *     non-empty, so the store always remains a readable table;
    *  3. the winners overwrite exactly the touched bucket partitions.
    * LIVE rows are `op != 'D'` — the reader's filter, pinned against
    * the 30s2 batch snapshot. Merges are max-version idempotent: a
    * replayed or stale-late batch recomputes identical bucket
    * contents (the [[snapshotStream]] semilattice argument, now
    * genuinely on files because the tombstones carry the delete's
    * version). The merged plan re-roots on a persisted RDD and is
    * consumed exactly once by the write (it reads the path it
    * rewrites; the overwrite's old files outlive the job, so write
    * retries still find them). Store paths go through the Hadoop
    * filesystem of `storeDir`'s scheme; single concurrent writer by
    * contract (the streaming checkpoint serializes batches). At
    * corpus scale the bucket count trades write amplification
    * against small-file pressure; [[compactStore]] and
    * [[retireTombstones]] are the periodic maintenance that keeps
    * both bounded. */
  def materialize(log: Dataset[CdcEvent], storeDir: String,
                  checkpointDir: String, nBuckets: Int): StreamingQuery = {
    require(nBuckets >= 1)
    log.toDF().writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch(materializeBatch(storeDir, nBuckets) _)
      .start()
  }

  /** The tombstone-version SIDECAR: `storeDir/_tomb` (underscore —
    * invisible to parquet reads of the store) holds one (bucket,
    * tmin) row per bucket that currently contains delete tombstones,
    * tmin = the bucket's minimum tombstone ver1. Maintained exactly
    * on every merge (the touched buckets' rows are recomputed from
    * the very data that replaced them) so [[retireTombstones]]'
    * discovery reads this one-file table instead of scanning the
    * store. Published ATOMICALLY: written to `_tomb.tmp`, then
    * delete-and-rename over `_tomb` — a crash at any point leaves the
    * old complete sidecar or none at all, and an ABSENT sidecar just
    * means fallback-to-scan (which rebuilds it), never a wrong
    * retirement. */
  private def tombSidecar(spark: org.apache.spark.sql.SparkSession,
                          storeDir: String,
                          touched: Seq[Int],
                          touchedRows: org.apache.spark.sql.DataFrame,
                          mergeOld: Boolean): Unit = {
    import org.apache.spark.sql.functions._
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tomb = new org.apache.hadoop.fs.Path(storePath, "_tomb")
    val tmp = new org.apache.hadoop.fs.Path(storePath, "_tomb.tmp")
    val merged =
      if (mergeOld && fs.exists(tomb))
        spark.read.parquet(tomb.toString)
          .filter(!col("bucket").isin(touched: _*))
          .unionByName(touchedRows)
      else touchedRows
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(tomb, true)
    if (!fs.rename(tmp, tomb))
      throw new java.io.IOException(s"sidecar rename failed: $tmp -> $tomb")
    ()
  }

  /** True when `root` holds any data file (non-underscore, non-dot,
    * outside metadata dirs) — the "is this parquet-readable" guard for
    * a store that retirement may have emptied of every bucket: a
    * parquet read of a root holding only `_started`/`_tomb`/`_ledger`
    * throws (no schema to infer), so callers check first. Metadata
    * listing only, no data read. */
  private def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path): Boolean = {
    def meta(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { s =>
        !meta(s.getPath.getName) && (s.isFile || walk(s.getPath))
      }
    fs.exists(root) && walk(root)
  }

  /** A zero-row frame in the sidecar's (bucket, tmin) schema — what an
    * all-buckets-retired store publishes so later retirements stay
    * sidecar-served (an absent sidecar would fall back to a scan that
    * has no files to infer a schema from). */
  private def emptySidecarRows(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq.empty[(Int, Long)].toDF("bucket", "tmin")
  }

  /** The foreachBatch handler (exposed for the spec's replay pins). */
  def materializeBatch(storeDir: String, nBuckets: Int)
                      (batch: org.apache.spark.sql.DataFrame,
                       batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    if (batch.isEmpty) return // an empty trigger has nothing to merge
    val b = batch.withColumn("bucket",
      pmod(col("id"), lit(nBuckets)).cast("int"))
    val touched: Seq[Int] = b.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(storePath, "_started")
    val bootstrapped = fs.exists(marker)
    val existing =
      // a bootstrapped store can still be DATALESS (retirement may
      // have emptied every bucket) — parquet cannot infer a schema
      // from underscore dirs alone, so such a store merges like a
      // fresh one
      if (bootstrapped && hasDataFiles(fs, storePath))
        spark.read.parquet(storeDir)
          .filter(col("bucket").isin(touched: _*))
      else b.limit(0)
    val merged = graft.operators.ChangeLog.latest(
        existing.unionByName(b), Seq("id"), Seq("ver1", "ver2"))
      .select(col("id"), col("ver1"), col("ver2"), col("op"),
        col("payload"), col("bucket"))
    // re-root on a persisted RDD before the overwrite: the merged plan
    // READS the same path the write overwrites, which Spark rightly
    // rejects without the truncation
    val (snap, snapRdd) = graft.operators.Rounds.materialize(merged,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    snapRdd.count()
    snap.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(storeDir)
    // maintain the tombstone sidecar from the SAME merged snapshot
    // that just replaced the touched buckets (exact by construction).
    // A pre-sidecar legacy store (bootstrapped, no _tomb) is left
    // alone — an incomplete sidecar would hide other buckets'
    // tombstones from discovery; retireTombstones' fallback scan
    // builds the complete one.
    val tomb = new org.apache.hadoop.fs.Path(storePath, "_tomb")
    if (!bootstrapped || fs.exists(tomb))
      tombSidecar(spark, storeDir, touched,
        snap.filter(col("op") === "D")
          .groupBy("bucket").agg(min(col("ver1")).as("tmin")),
        mergeOld = bootstrapped)
    snapRdd.unpersist(blocking = false)
    // the marker makes first-batch bootstrap explicit; created AFTER
    // the first successful write
    if (!fs.exists(marker)) fs.create(marker, true).close()
    ()
  }

  // ---- the snapshot-manifest variant (bucket-grain MVCC, r15) ------
  //
  // The journaled store above is crash-atomic but NOT reader-isolated:
  // every merge's dynamic partition overwrite deletes a touched
  // bucket's old files before renaming the new ones in, so a live
  // reader overlapping a merge/compaction/retirement can see a partial
  // bucket (single-writer declared). This variant publishes through
  // [[graft.sources.SnapshotStore]]'s versioned manifest: each merge
  // writes the touched buckets' NEW state as a fresh immutable part
  // (`data/b_x/bucket=N/…`) plus a fresh complete tombstone table
  // (`tomb/t_x/…` — the `_tomb` sidecar promoted to a manifest line
  // set, transactional WITH the data instead of best-effort beside
  // it), and swaps CURRENT once — a reader resolves a complete store
  // or the prior one, never a mix. Two structural simplifications
  // fall out: no compaction exists (a merge REPLACES its buckets'
  // lines, so a bucket is always exactly one live file), and no
  // rollback journal exists (unpublished parts are invisible debris
  // [[retireSnapshot]] sweeps; a torn merge re-runs against the prior
  // generation). Exactly-once is a marker replay gate plus the
  // max-version semilattice: replaying a published batch recomputes
  // semantically identical bucket contents, so even a lost marker
  // cannot corrupt. Reclamation moves to the manifest grace window.

  private val BucketRe = "/bucket=(\\d+)/".r
  private def bucketOf(line: String): Option[Int] =
    BucketRe.findFirstMatchIn(line).map(_.group(1).toInt)
  private def isTombLine(l: String): Boolean = l.startsWith("tomb/")

  private def uuid12 = java.util.UUID.randomUUID().toString.take(12)

  /** Streaming maintenance of the snapshot store. */
  def materializeSnapshot(log: Dataset[CdcEvent], storeDir: String,
                          checkpointDir: String,
                          nBuckets: Int): StreamingQuery = {
    require(nBuckets >= 1)
    log.toDF().writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch(materializeSnapshotBatch(storeDir, nBuckets) _)
      .start()
  }

  /** One micro-batch merge into the snapshot store (exposed for the
    * spec's replay pins and for batch-driven callers). */
  def materializeSnapshotBatch(storeDir: String, nBuckets: Int)
                              (batch: org.apache.spark.sql.DataFrame,
                               batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val store = graft.sources.SnapshotStore
    val fs = new org.apache.hadoop.fs.Path(storeDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(storeDir,
      s"_ledger/batch.$batchId")
    if (fs.exists(marker)) return
    def mark(): Unit = { fs.create(marker, true).close() }
    if (batch.isEmpty) { mark(); return }
    val fence = store.acquireFence(spark, storeDir)
    val lines = store.currentFiles(spark, storeDir)
    def bucketCol = pmod(col("id"), lit(nBuckets)).cast("int")
    val b = batch.withColumn("bucket", bucketCol)
    val touched: Set[Int] = b.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val touchedLines = lines.filter(l => bucketOf(l).exists(touched))
    // the touched buckets' committed state (bucket re-derived from id
    // — the partition column does not ride inside the files)
    val existing =
      if (touchedLines.nonEmpty)
        store.readFiles(spark, storeDir, touchedLines)
          .withColumn("bucket", bucketCol)
      else b.limit(0)
    val relD = s"data/b_$uuid12"
    graft.operators.ChangeLog.latest(
        existing.unionByName(b), Seq("id"), Seq("ver1", "ver2"))
      .select(col("id"), col("ver1"), col("ver2"), col("op"),
        col("payload"), col("bucket"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(s"$storeDir/$relD")
    val newData = store.partFiles(spark, storeDir, relD)
    // the tombstone table: untouched buckets' rows ride through, the
    // touched buckets' rows are re-derived from the state that was
    // just written (exact by construction, and published in the SAME
    // generation as the data — no sidecar swap window)
    val tombLines = lines.filter(isTombLine)
    val fresh = store.readFiles(spark, storeDir, newData)
      .withColumn("bucket", bucketCol)
      .filter(col("op") === "D")
      .groupBy("bucket").agg(min(col("ver1")).as("tmin"))
    val oldTomb =
      if (tombLines.nonEmpty)
        store.readFiles(spark, storeDir, tombLines)
          .filter(!col("bucket").isin(touched.toSeq: _*))
      else fresh.limit(0)
    val relT = s"tomb/t_$uuid12"
    oldTomb.unionByName(fresh).coalesce(1)
      .write.parquet(s"$storeDir/$relT")
    store.publishNext(spark, storeDir,
      lines.filterNot(touchedLines.toSet).filterNot(tombLines.toSet) ++
        newData ++ store.partFiles(spark, storeDir, relT), fence)
    mark()
  }

  /** The committed snapshot (tombstones included — live rows are
    * `op != 'D'`, the 30s2 reader filter), pinned to one generation
    * for the plan's lifetime. Empty store = empty frame. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
                   storeDir: String): org.apache.spark.sql.DataFrame = {
    val store = graft.sources.SnapshotStore
    val dataLines = store.currentFiles(spark, storeDir)
      .filter(l => bucketOf(l).isDefined)
    if (dataLines.isEmpty) {
      import spark.implicits._
      Seq.empty[(Long, Long, Long, String, String)]
        .toDF("id", "ver1", "ver2", "op", "payload")
    } else store.readFiles(spark, storeDir, dataLines)
      .select("id", "ver1", "ver2", "op", "payload")
  }

  /** [[retireTombstones]] for the snapshot store: discovery reads the
    * manifest's tombstone table, qualifying buckets rewrite to fresh
    * parts (a fully-retired bucket simply publishes no lines), and
    * data + tombstone table move in ONE generation. Same horizon
    * safety argument as the journaled variant. */
  def retireTombstonesSnapshot(spark: org.apache.spark.sql.SparkSession,
                               storeDir: String, horizonVer1: Long,
                               nBuckets: Int): Unit = {
    import org.apache.spark.sql.functions._
    val store = graft.sources.SnapshotStore
    val fence = store.acquireFence(spark, storeDir)
    val lines = store.currentFiles(spark, storeDir)
    val tombLines = lines.filter(isTombLine)
    if (tombLines.isEmpty) return
    val touched: Set[Int] = store.readFiles(spark, storeDir, tombLines)
      .filter(col("tmin") < horizonVer1)
      .select("bucket").collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return
    def bucketCol = pmod(col("id"), lit(nBuckets)).cast("int")
    val touchedData = lines.filter(l => bucketOf(l).exists(touched))
    val retirable = col("op") === "D" && col("ver1") < horizonVer1
    val relD = s"data/r_$uuid12"
    store.readFiles(spark, storeDir, touchedData)
      .filter(!retirable)
      .withColumn("bucket", bucketCol)
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(s"$storeDir/$relD")
    val newData = store.partFiles(spark, storeDir, relD)
    val survivors =
      if (newData.nonEmpty)
        store.readFiles(spark, storeDir, newData)
          .withColumn("bucket", bucketCol)
          .filter(col("op") === "D")
          .groupBy("bucket").agg(min(col("ver1")).as("tmin"))
      else {
        import spark.implicits._
        Seq.empty[(Int, Long)].toDF("bucket", "tmin")
      }
    val relT = s"tomb/t_$uuid12"
    store.readFiles(spark, storeDir, tombLines)
      .filter(!col("bucket").isin(touched.toSeq: _*))
      .unionByName(survivors)
      .coalesce(1).write.parquet(s"$storeDir/$relT")
    store.publishNext(spark, storeDir,
      lines.filterNot(touchedData.toSet).filterNot(tombLines.toSet) ++
        newData ++ store.partFiles(spark, storeDir, relT), fence)
    ()
  }

  /** Reclaim files unreferenced by the newest `keepGenerations`
    * manifests plus torn writers' debris (file grain; size the window
    * to the longest-running reader). */
  def retireSnapshot(spark: org.apache.spark.sql.SparkSession,
                     storeDir: String, keepGenerations: Int = 2): Unit =
    graft.sources.SnapshotStore.retireFileGrain(spark, storeDir,
      keepGenerations)

  /** Compact the store's fragmented buckets to one file each — the
    * small-file maintenance [[materialize]] defers (every micro-batch
    * adds one part per touched bucket). Row contents never change, so
    * the live snapshot, the tombstone set, and every future merge are
    * bit-identical before/after (ChangeLogStreamSpec pins it). Run
    * between micro-batches: the single-writer contract that already
    * serializes batches also serializes maintenance. Crash-atomic
    * (r13): the rewritten buckets run under the store's rewrite
    * journal, so a kill mid-overwrite restores them byte-for-byte. */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
                   storeDir: String, minParts: Int = 2): Unit = {
    val frag = graft.sources.BucketMaintenance.fragmentedBuckets(
      spark, storeDir, minParts)
    if (frag.isEmpty) return
    // rename-displacing journal (r14): the staged snapshot is the only
    // reader of the old files, so the undo backup is a rename
    graft.sources.CommitLog.rewritingStaged(spark, storeDir,
      frag.map(b => s"bucket=$b"))(
      graft.sources.BucketMaintenance.stageRewrite(spark, storeDir, frag))(
      _.foreach(graft.sources.BucketMaintenance.publishRewrite(spark, _)))
  }

  /** Retire delete tombstones STRICTLY below the feed's out-of-order
    * horizon: drop every (op='D', ver1 < `horizonVer1`) row. Without
    * retirement the store carries one row per key ever deleted,
    * forever.
    *
    * Safety argument (why no outcome can change): a tombstone exists
    * to defeat a STALE upsert — one whose version is lower than the
    * delete's. A retired tombstone has ver1 < horizon, so any upsert
    * it could have defeated also has ver1 < horizon, and the horizon
    * contract says such an event never arrives again. Every event
    * that CAN still arrive has ver1 >= horizon > the retired
    * tombstone's version and would have beaten it anyway — for those
    * events the store with and without the tombstone behaves
    * identically (spec-pinned by running the same post-retirement
    * batches through both). Choose the horizon from the feed's
    * watermark, never from wall clock.
    *
    * Scale shape (r14): DISCOVERY reads the per-bucket
    * tombstone-version sidecar (`_tomb`: one (bucket, min tombstone
    * ver1) row per tombstone-holding bucket, maintained exactly by
    * every merge) — a one-file metadata read, so retirement touches
    * ONLY the sidecar plus the qualifying buckets. A store without a
    * sidecar (pre-r14, or one torn mid-publish — the sidecar swap is
    * atomic, so "absent" is the only failure face) falls back to the
    * old full-store discovery scan (column-pruned to (op, ver1,
    * bucket), tombstone predicate pushed to parquet) and REBUILDS the
    * complete sidecar from the store it just scanned. Either way the
    * rewritten buckets' sidecar rows are refreshed from a
    * partition-pruned re-read after the rewrite. Run at compaction
    * cadence, not per batch. A bucket emptied by retirement has its
    * partition directory removed. */
  def retireTombstones(spark: org.apache.spark.sql.SparkSession,
                       storeDir: String, horizonVer1: Long): Unit = {
    import org.apache.spark.sql.functions._
    val retirable = col("op") === "D" && col("ver1") < horizonVer1
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tomb = new org.apache.hadoop.fs.Path(storePath, "_tomb")
    val fromSidecar = fs.exists(tomb)
    val touched: Seq[Int] =
      if (fromSidecar)
        spark.read.parquet(tomb.toString)
          .filter(col("tmin") < horizonVer1)
          .select("bucket").collect().map(_.getInt(0)).toSeq
      else
        spark.read.parquet(storeDir).filter(retirable)
          .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) {
      // a sidecar-less store with nothing to retire still earns its
      // sidecar from the scan that just proved that (a DATALESS store
      // gets the empty sidecar directly — no schema to scan)
      if (!fromSidecar && fs.exists(storePath))
        tombSidecar(spark, storeDir, Nil,
          if (hasDataFiles(fs, storePath))
            spark.read.parquet(storeDir).filter(col("op") === "D")
              .groupBy("bucket").agg(min(col("ver1")).as("tmin"))
          else emptySidecarRows(spark),
          mergeOld = false)
      return
    }
    // crash-atomic (r13): the touched buckets run under the store's
    // rewrite journal (a kill mid-overwrite would otherwise lose a
    // bucket, not just leave an unretired tombstone); r14: the
    // rename-displacing variant, so the undo backup costs no write
    graft.sources.CommitLog.rewritingStaged(spark, storeDir,
      touched.map(b => s"bucket=$b"))(
      graft.sources.BucketMaintenance.stageRewrite(spark, storeDir,
        touched, _.filter(!retirable)))(
      _.foreach(graft.sources.BucketMaintenance.publishRewrite(spark, _)))
    // refresh the sidecar: rewritten buckets re-derived from a
    // partition-pruned read; on the fallback path the whole sidecar
    // rebuilds so future retirements are sidecar-served. A store the
    // retirement just EMPTIED of every bucket has no schema to read —
    // it gets the empty sidecar directly (absent would also be safe,
    // but a stale one — the pre-refresh state — would not, so the
    // refresh must not throw past the closed journal)
    if (fs.exists(storePath)) {
      if (hasDataFiles(fs, storePath)) {
        val base =
          if (fromSidecar)
            spark.read.parquet(storeDir).filter(col("bucket").isin(touched: _*))
          else spark.read.parquet(storeDir)
        tombSidecar(spark, storeDir,
          if (fromSidecar) touched else Nil,
          base.filter(col("op") === "D")
            .groupBy("bucket").agg(min(col("ver1")).as("tmin")),
          mergeOld = fromSidecar)
      } else
        tombSidecar(spark, storeDir, Nil, emptySidecarRows(spark),
          mergeOld = false)
    }
  }
}
