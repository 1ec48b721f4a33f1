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

  private def write(df: DataFrame, id: Column, text: Column, dir: String,
                    nBuckets: Int, overwrite: Boolean): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    // one tokenization feeds BOTH jobs (postings + stats)
    val base = Bm25.tokenized(df, id, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      base.select(col("doc_id"), col("dl"), explode(col("_tk")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
        .withColumn("bucket",
          pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
        .write.mode(mode)
        // STATIC overwrite pinned: under a session's dynamic mode a
        // REBUILD would leave stale buckets absent from the new
        // corpus while meta truncates — an inconsistent index
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket").parquet(s"$dir/postings")
      base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        .withColumn("n_buckets", lit(nBuckets))
        .write.mode(mode).parquet(s"$dir/meta")
    } finally { base.unpersist(blocking = false); () }
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
