package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED + INCREMENTAL BM25 index — the retrieval member of the
  * incremental family (22a exact dedup, 24c near-dup, 27i4 graph,
  * 27m2 IVF, 23e clusters, 7i2 sketches): [[Bm25.topK]] re-reads and
  * re-tokenizes the corpus per query batch; the index pays the
  * token-grain work ONCE at build, appends each crawl batch's
  * postings without touching old ones, and serves queries from the
  * artifact.
  *
  * Layout under `dir`:
  *  - `postings/` — (term, doc_id, tf, dl) partitioned by
  *    `bucket = pmod(xxhash64(term), nBuckets)`, so a query reads
  *    only its terms' buckets (driver-computed `isin` → static
  *    partition pruning, the 30s4 pattern) and an append writes new
  *    files into existing partitions without rewriting them;
  *  - `meta/` — one (n_docs, sum_dl) row per build/append part:
  *    corpus stats are sums of per-part sums (exact integers), so
  *    serving reads meta and adds.
  *
  * EXACTNESS: document frequency is counted from the query-filtered
  * postings at serving time (df is a property of the postings, not a
  * second artifact to drift); tf/dl rows for a document are identical
  * whether it arrived at build or append; N/sum_dl are associative
  * integer sums; and the scoring tail IS [[Bm25.scoreTf]] — so index
  * serving over base ∪ appended batches is BIT-IDENTICAL to
  * [[Bm25.topK]] over the concatenated corpus, which is what lets the
  * registry query reuse the direct query's SQL oracle verbatim.
  *
  * Append idempotence is the caller's stream contract (wrap in the
  * 21w/30s4 foreachBatch patterns for exactly-once); [[compact]]
  * folds the accumulated small append parts back down with serving
  * pinned bit-identical (Bm25IndexSpec). */
object Bm25Index {

  def build(df: DataFrame, id: Column, text: Column, dir: String,
            nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1)
    write(df, id, text, dir, nBuckets, overwrite = true)
  }

  /** Append a new batch's postings + stats part — cost scales with
    * the batch (its own tokenization and one bucket-partitioned
    * write), never the index. The bucket layout comes from the
    * STORED meta (a layout parameter is corruption waiting to
    * mismatch, so it is persisted once at build and never passed
    * again). Batch doc ids must be disjoint from indexed ones
    * (re-ingest dedup is 22a's job). */
  def append(df: DataFrame, id: Column, text: Column,
             dir: String): Unit =
    write(df, id, text, dir, storedBuckets(df.sparkSession, dir),
      overwrite = false)

  /** The bucket count the index was built with, read from meta —
    * the single source of layout truth for append and topK. */
  private def storedBuckets(spark: SparkSession, dir: String): Int = {
    val n = spark.read.parquet(s"$dir/meta")
      .select(min(col("n_buckets")), max(col("n_buckets"))).head()
    require(n.getInt(0) == n.getInt(1),
      s"inconsistent n_buckets in $dir/meta: ${n.getInt(0)} vs ${n.getInt(1)}")
    n.getInt(0)
  }

  /** One tokenization pass feeding BOTH artifacts: sink receives the
    * batch's bucketed postings rows and its one-row stats part. */
  private def derive[A](df: DataFrame, id: Column, text: Column,
                        nBuckets: Int)
                       (sink: (DataFrame, DataFrame) => A): A = {
    val base = Bm25.tokenized(df, id, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try sink(
      base.select(col("doc_id"), col("dl"), explode(col("_tk")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
        .withColumn("bucket",
          pmod(xxhash64(col("term")), lit(nBuckets)).cast("int")),
      base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        .withColumn("n_buckets", lit(nBuckets)))
    finally { base.unpersist(blocking = false); () }
  }

  private def write(df: DataFrame, id: Column, text: Column, dir: String,
                    nBuckets: Int, overwrite: Boolean): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    derive(df, id, text, nBuckets) { (postings, stats) =>
      postings
        .write.mode(mode)
        // STATIC overwrite pinned: under a session's dynamic mode a
        // REBUILD would leave stale buckets absent from the new
        // corpus while meta truncates — an inconsistent index
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket").parquet(s"$dir/postings")
      stats.write.mode(mode).parquet(s"$dir/meta")
    }
  }

  /** Compact the index in place — the "35-story" maintenance the
    * append path defers: every [[append]] adds one parquet part per
    * touched postings bucket plus one meta row, so at crawl cadence a
    * bucket accumulates thousands of tiny files whose open/footer cost
    * eventually dominates serving. Compaction rewrites each FRAGMENTED
    * bucket (>= `minParts` data files) into a single file and folds
    * the meta parts into one row.
    *
    * Serving stays BIT-IDENTICAL: postings rows are re-filed, never
    * changed, and the meta fold is the same associative integer sum
    * serving already computes ([[topK]] aggregates meta before use, so
    * one pre-summed row reads back the exact same N / sum_dl). The two
    * steps are independently idempotent and each preserves serving on
    * its own, so a failure between them leaves a valid index.
    *
    * Scale shape: work is proportional to the fragmented buckets'
    * data, not the index — intact buckets are never read (the same
    * static `isin` pruning serving uses), and each rewritten bucket's
    * rows hash to one task (`repartition` on the partition column), so
    * the overwrite emits exactly one file per bucket.
    *
    * Crash-atomic (r13): the whole pass runs under the store's
    * rewrite journal ([[graft.sources.CommitLog.rewriting]] — the
    * fragmented buckets and the meta dir are backed up before the
    * overwrites), so a kill inside a partition overwrite's
    * delete-then-rename commit window restores the pre-compaction
    * store byte-for-byte instead of losing a bucket. */
  def compact(spark: SparkSession, dir: String, minParts: Int = 2): Unit = {
    val frag = graft.sources.BucketMaintenance.fragmentedBuckets(
      spark, s"$dir/postings", minParts)
    val metaFold =
      spark.read.parquet(s"$dir/meta").inputFiles.length >= minParts
    if (frag.isEmpty && !metaFold) return
    val backup = frag.map(b => s"postings/bucket=$b") ++
      (if (metaFold) Seq("meta") else Nil)
    // rename-displacing journal (r14): everything the publish writes
    // is materialized up front (the staged bucket snapshot; the meta
    // fold is a driver-collected row), so the undo backup is a rename
    // instead of a second full write of the fragmented slice
    graft.sources.CommitLog.rewritingStaged(spark, dir, backup)({
      val staged = graft.sources.BucketMaintenance.stageRewrite(spark,
        s"$dir/postings", frag)
      // meta: fold all build/append rows into one (driver-sized — one
      // row per historical append; the collect sidesteps the
      // read-overwrite conflict entirely)
      val metaRow =
        if (!metaFold) None
        else {
          val r = spark.read.parquet(s"$dir/meta")
            .agg(sum(col("n_docs")).as("n_docs"),
              sum(col("sum_dl")).as("sum_dl"),
              min(col("n_buckets")).as("_bmin"), max(col("n_buckets")).as("_bmax"))
            .head()
          require(r.getInt(2) == r.getInt(3),
            s"inconsistent n_buckets in $dir/meta: ${r.getInt(2)} vs ${r.getInt(3)}")
          Some((r.getLong(0), r.getLong(1), r.getInt(2)))
        }
      (staged, metaRow)
    }) { case (staged, metaRow) =>
      staged.foreach(graft.sources.BucketMaintenance.publishRewrite(spark, _))
      metaRow.foreach { r =>
        import spark.implicits._
        Seq(r).toDF("n_docs", "sum_dl", "n_buckets")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
      }
    }
  }

  // ---- the snapshot-manifest variant (bucket-grain MVCC, r15) ------
  //
  // The journaled index above is crash-atomic but NOT reader-isolated:
  // compact's dynamic partition overwrite deletes a bucket's old files
  // before renaming the new ones in, so a live reader overlapping
  // maintenance can see a partial bucket (single-writer DECLARED, the
  // r14 verdict's last scale weakness in the store family). This
  // variant publishes the same artifacts through
  // [[graft.sources.SnapshotStore]]'s versioned manifest at BUCKET
  // grain: postings/meta batches land as immutable part subtrees
  // (`parts/p_x/bucket=N/…`, `parts/m_x/…`), each publication is one
  // atomic CURRENT swap, and a reader resolves CURRENT once — so a
  // query keeps serving its exact generation while compaction
  // replaces single buckets' files underneath it (never a mix,
  // Bm25SnapshotSpec's pin). Serving stays BIT-IDENTICAL to the
  // journaled path (same postings rows, same associative meta sums,
  // same [[Bm25.scoreTf]] tail), so q_bm25's oracle applies verbatim
  // through build + append + compaction. No CommitLog: unpublished
  // parts are invisible orphans [[retireSnapshot]] sweeps; space
  // reclamation moves to the manifest's grace window. Scale shape is
  // unchanged — a query still reads only its terms' buckets (the
  // prune moves from partition dirs to MANIFEST LINES, which is also
  // what lets compaction supersede one bucket's files while every
  // other line rides through).

  /** Bucket id of a manifest line, None for meta/non-bucket lines. */
  private val BucketRe = "/bucket=(\\d+)/".r
  private def bucketOf(line: String): Option[Int] =
    BucketRe.findFirstMatchIn(line).map(_.group(1).toInt)
  private def isMetaLine(l: String): Boolean = l.startsWith("parts/m_")

  /** The stored bucket count, from the snapshot's meta lines. */
  private def bucketsOfMeta(meta: DataFrame, dir: String): Int = {
    val n = meta.select(min(col("n_buckets")), max(col("n_buckets"))).head()
    require(n.getInt(0) == n.getInt(1),
      s"inconsistent n_buckets in $dir: ${n.getInt(0)} vs ${n.getInt(1)}")
    n.getInt(0)
  }

  private def snapshotMeta(spark: SparkSession, dir: String,
                           lines: Seq[String]): DataFrame =
    graft.sources.SnapshotStore.readFiles(spark, dir, lines.filter(isMetaLine))

  /** Write one batch's postings + stats as fresh immutable parts and
    * publish `keep ++ their files` as the next generation, under the
    * caller's writer fence (claimed before `keep` was read). */
  private def publishParts(df: DataFrame, id: Column, text: Column,
                           dir: String, nBuckets: Int,
                           keep: Seq[String], fence: Long): Unit = {
    val spark = df.sparkSession
    val uid = java.util.UUID.randomUUID().toString.take(12)
    derive(df, id, text, nBuckets) { (postings, stats) =>
      // one file per bucket (repartition on the partition column) —
      // the artifact's file count grows with BATCHES, not tasks
      postings.repartition(col("bucket"))
        .write.partitionBy("bucket").parquet(s"$dir/parts/p_$uid")
      stats.coalesce(1).write.parquet(s"$dir/parts/m_$uid")
    }
    graft.sources.SnapshotStore.publishNext(spark, dir, keep ++
      graft.sources.SnapshotStore.partFiles(spark, dir, s"parts/p_$uid") ++
      graft.sources.SnapshotStore.partFiles(spark, dir, s"parts/m_$uid"),
      fence)
    ()
  }

  /** Build the snapshot index (a rebuild publishes a manifest of only
    * the new parts — superseded files await [[retireSnapshot]], so
    * in-flight readers of the old corpus keep serving it). */
  def buildSnapshot(df: DataFrame, id: Column, text: Column, dir: String,
                    nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1)
    val fence = graft.sources.SnapshotStore.acquireFence(df.sparkSession, dir)
    publishParts(df, id, text, dir, nBuckets, Nil, fence)
  }

  /** Append one batch: new parts + the prior generation's lines,
    * published atomically under a fence claimed BEFORE the lines are
    * read (a second writer claiming after us makes our publish throw
    * instead of dropping its lines). Layout truth (bucket count)
    * comes from the stored meta, as in [[append]]. */
  def appendSnapshot(df: DataFrame, id: Column, text: Column,
                     dir: String): Unit = {
    val spark = df.sparkSession
    val fence = graft.sources.SnapshotStore.acquireFence(spark, dir)
    val lines = graft.sources.SnapshotStore.currentFiles(spark, dir)
    publishParts(df, id, text, dir,
      bucketsOfMeta(snapshotMeta(spark, dir, lines), dir), lines, fence)
  }

  /** Fold every fragmented bucket (>= `minParts` manifest lines) to
    * one file and the meta parts to one row, as ONE new generation:
    * intact buckets' lines ride through untouched, replaced files
    * stay on disk for in-flight readers, and serving is bit-identical
    * (rows re-filed, the meta fold is the sum serving computes). */
  def compactSnapshot(spark: SparkSession, dir: String,
                      minParts: Int = 2): Unit = {
    val store = graft.sources.SnapshotStore
    val fence = store.acquireFence(spark, dir)
    val lines = store.currentFiles(spark, dir)
    val byBucket = lines.flatMap(l => bucketOf(l).map(_ -> l))
      .groupBy(_._1).map { case (b, ls) => b -> ls.map(_._2) }
    val fragFiles = byBucket.valuesIterator
      .filter(_.length >= minParts).flatten.toSeq
    val metaLines = lines.filter(isMetaLine)
    val metaFold = metaLines.length >= minParts
    if (fragFiles.isEmpty && !metaFold) return
    val nb = bucketsOfMeta(snapshotMeta(spark, dir, lines), dir)
    val uid = java.util.UUID.randomUUID().toString.take(12)
    var next = lines
    if (fragFiles.nonEmpty) {
      // bucket is re-derived from term — the very function that
      // assigned it — so the fold needs no partition-column recovery
      store.readFiles(spark, dir, fragFiles)
        .withColumn("bucket",
          pmod(xxhash64(col("term")), lit(nb)).cast("int"))
        .repartition(col("bucket"))
        .write.partitionBy("bucket").parquet(s"$dir/parts/c_$uid")
      next = next.filterNot(fragFiles.toSet) ++
        store.partFiles(spark, dir, s"parts/c_$uid")
    }
    if (metaFold) {
      import spark.implicits._
      val r = store.readFiles(spark, dir, metaLines)
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"),
          min(col("n_buckets")).as("_bmin"), max(col("n_buckets")).as("_bmax"))
        .head()
      require(r.getInt(2) == r.getInt(3),
        s"inconsistent n_buckets in $dir: ${r.getInt(2)} vs ${r.getInt(3)}")
      Seq((r.getLong(0), r.getLong(1), r.getInt(2)))
        .toDF("n_docs", "sum_dl", "n_buckets")
        .coalesce(1).write.parquet(s"$dir/parts/m_$uid")
      next = next.filterNot(metaLines.toSet) ++
        store.partFiles(spark, dir, s"parts/m_$uid")
    }
    store.publishNext(spark, dir, next, fence)
    ()
  }

  /** Reclaim files unreferenced by the newest `keepGenerations`
    * manifests (file grain — a compaction supersedes single files
    * inside part dirs that stay live for their other buckets), plus
    * torn writers' orphans. Size the window to the longest reader. */
  def retireSnapshot(spark: SparkSession, dir: String,
                     keepGenerations: Int = 2): Unit =
    graft.sources.SnapshotStore.retireFileGrain(spark, dir, keepGenerations)

  /** [[topK]] served from the manifest's CURRENT generation: the
    * query's term buckets select manifest LINES (the static prune,
    * now at file grain), and the whole plan pins to that exact file
    * set for its lifetime — bit-identical to [[Bm25.topK]] over the
    * same corpus. */
  def topKSnapshot(spark: SparkSession, dir: String,
                   queries: Seq[(Int, String)], k: Int = 10,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val store = graft.sources.SnapshotStore
    val lines = store.currentFiles(spark, dir)
    val meta = snapshotMeta(spark, dir, lines)
    val nBuckets = bucketsOfMeta(meta, dir)
    val qTerms = Bm25.queryTerms(spark, queries)
    val terms = qTerms.select("term").distinct()
    val bks = terms.withColumn("bucket",
        pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    val postLines = lines.filter(l => bucketOf(l).exists(bks))
    val tfAll =
      if (postLines.nonEmpty) store.readFiles(spark, dir, postLines)
      else {
        // none of the query's buckets materialized a file: serve the
        // empty result in the postings schema (one any-bucket footer)
        val any = lines.filter(l => bucketOf(l).isDefined)
        require(any.nonEmpty, s"empty snapshot BM25 index at $dir")
        store.readFiles(spark, dir, any.take(1)).limit(0)
      }
    val tf = tfAll.join(broadcast(terms), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    val stats = meta
      .agg(sum(col("n_docs")).as("_n"), sum(col("sum_dl")).as("_sumdl"))
    Bm25.scoreTf(tf, stats, qTerms, k, k1, b)
  }

  /** Serve top-`k` per query from the persisted index — bit-identical
    * to [[Bm25.topK]] over the same corpus. */
  def topK(spark: SparkSession, dir: String, queries: Seq[(Int, String)],
           k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val nBuckets = storedBuckets(spark, dir)
    val qTerms = Bm25.queryTerms(spark, queries)
    val terms = qTerms.select("term").distinct()
    // driver-side bucket ids of the query terms -> static pruning
    // (terms is driver-sized by the query contract, so the collect is
    // a handful of rows)
    val bks = terms.withColumn("bucket",
        pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    val tf = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(bks: _*))
      .join(broadcast(terms), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    val stats = spark.read.parquet(s"$dir/meta")
      .agg(sum(col("n_docs")).as("_n"), sum(col("sum_dl")).as("_sumdl"))
    Bm25.scoreTf(tf, stats, qTerms, k, k1, b)
  }
}
