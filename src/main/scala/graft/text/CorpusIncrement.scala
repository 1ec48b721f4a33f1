package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Postings
import graft.operators.{ConnectedComponents, Rounds}

/** INCREMENTAL end-to-end corpus build — the composition the r11
  * incremental pieces exist for: [[CorpusBuild.run]] re-reads and
  * re-shuffles the whole corpus per run; this operator runs the SAME
  * 31g chain (quality gate → exact dedup → near-dup cluster keep →
  * decontamination → stratified sampling) on a new crawl batch against
  * PERSISTED artifacts, so a day's increment never re-tokenizes or
  * re-shuffles yesterday's corpus — and still returns a corpus output
  * HASH-IDENTICAL to a full rebuild over base ∪ batch (q_icorpus
  * reuses q_corpus's DuckDB oracle verbatim; CorpusIncrementSpec
  * plants one casualty per stage in the batch, including the
  * df-band-crossing cases where a batch doc retroactively changes
  * BASE-vs-BASE pair evidence).
  *
  * Artifacts under `dir` (ADD-ONLY on the increment path: parquet
  * appends plus fresh version directories — the property the
  * rollback journal's undo-by-delete depends on):
  *  - `hidx/`   (h = xxhash64(text), doc_id): exact-dedup index, one
  *    row per distinct surviving text (22a's artifact);
  *  - `post/`   (shingle, doc_id) for every exact-dedup survivor,
  *    partitioned by shingle-hash bucket, plus the DUAL doc-bucketed
  *    copy `postd/` — shingle-keyed and doc-keyed probes each prune
  *    statically, at 2x linear storage (the dual-index trade);
  *  - `df/`     additive (shingle, df) parts — document frequency is a
  *    SUM over parts, so an append never rewrites old rows (the
  *    LSM/delta pattern; merge at read is an increment-grain groupBy);
  *  - `exdocs/` (doc_id, lang, source, dflag): per-doc INTRINSIC facts
  *    — decon flags are computed for every survivor at ingest (they
  *    depend only on doc text vs the fixed eval set), so a doc that
  *    resurrects when a cluster splits needs no text rescan;
  *  - `evalsh/` the eval suite's distinct decon n-grams (fixed size);
  *  - `pairs/`, `labels/` the near-dup pair graph and its components —
  *    the two artifacts whose contents an increment REPLACES (pair
  *    evidence can be retracted, see below), both sparse (dup
  *    evidence, not corpus) so the rewrite is cheap. Each replacement
  *    lands as a fresh `v=K/` VERSION directory (readers resolve the
  *    latest version published with a `_SUCCESS`; superseded versions
  *    are retired by [[compact]], the same cadence that folds small
  *    parts) — so an increment only ever ADDS files, which is what
  *    lets the streaming wrapper's rollback journal
  *    ([[graft.sources.CommitLog]]) undo a torn batch exactly;
  *  - `meta/`   params + the running max doc id (layout truth read
  *    back at increment time, the Bm25Index lesson).
  *
  * Ordering contract (fail-fast enforced): batch doc ids strictly
  * exceed all indexed ids. Exact dedup keeps the MIN id per text, so
  * ids-grow-with-time makes "first seen wins" and full-rebuild min-id
  * agree — without it an increment could not match a rebuild without
  * retracting already-published base docs at the exact stage too.
  *
  * WHY the near-dup stage needs more than "probe the index": pair
  * evidence is df-capped Jaccard (intersections count only shingles
  * with df in [2, maxDf] over the CURRENT corpus), so a batch can
  * change base-vs-base evidence — a shingle pushed past maxDf removes
  * intersections (a base pair can die and its cluster SPLIT,
  * resurrecting a suppressed doc). The increment is still exact:
  *  1. classify every batch-present shingle by old/new band status.
  *     Only band-CROSSING shingles can change base-vs-base evidence
  *     (a doc's shingle set never changes, so a stays-in-band
  *     shingle's contribution to any base-base intersection is
  *     fixed); their postings docs plus the batch form the
  *     full-recompute set C — increment-grain even on
  *     vocabulary-dense corpora, because the common stays-in case
  *     never drags base docs into C;
  *  2. recompute pairs WITHIN C exactly (complete postings + true
  *     new-state bands), and generate the only other pairs that can
  *     exist — NEW (base ∉ C) × batch pairs — by a per-shingle cross
  *     expansion over batch-present in-band shingles (every shared
  *     in-band shingle of such a pair is batch-present, so the
  *     expansion counts the exact intersection; set sizes are per-doc
  *     intrinsics from `exdocs/`). Any pair with at most one endpoint
  *     in C and no batch endpoint is provably unchanged (a changed
  *     shared shingle would have put both endpoints in C) and rides
  *     through from `pairs/`;
  *  3. re-solve components only for old components touching C or a
  *     new pair's endpoints (splits AND merges handled, because the
  *     subgraph is re-solved from its final edge set, not patched).
  *
  * Scale shape: no corpus-scale SHUFFLE anywhere on the increment
  * path. The corpus-scale artifacts are touched by broadcast-filtered
  * map-side reads only (hidx once, post/df by shingle-bucket prunes,
  * the affected-doc postings by a doc-bucket prune of postd/, exdocs
  * once — the last is output-grain and inherent: the result IS the
  * whole corpus sample); every such read statically prunes to the
  * probe set's buckets (driver-collected bucket ids, the 30l3
  * pattern). Every exchange is increment-grain.
  * Bounded-batch contract as for 23e: a batch of corpus magnitude is
  * a rebuild, not an increment. The one assembly join (labels onto
  * exdocs) is dup-evidence-sized on the build side; at corpus scale
  * pre-bucket both on doc_id (7f) to avoid the exchange.
  */
object CorpusIncrement {

  private val lvl = StorageLevel.MEMORY_AND_DISK

  private case class Meta(k: Int, threshold: Double, maxDf: Long,
                          deconN: Int, nBuckets: Int,
                          rates: Map[String, Double], defaultRate: Double,
                          maxDocId: Long)

  private def readMeta(spark: SparkSession, dir: String): Meta = {
    val rows = spark.read.parquet(s"$dir/meta").collect()
    require(rows.nonEmpty, s"no meta under $dir")
    val ps = rows.map { r =>
      (r.getInt(r.fieldIndex("shingle_k")), r.getDouble(r.fieldIndex("threshold")),
        r.getLong(r.fieldIndex("max_df")), r.getInt(r.fieldIndex("decon_n")),
        r.getInt(r.fieldIndex("n_buckets")),
        r.getSeq[String](r.fieldIndex("rate_grps")),
        r.getSeq[Double](r.fieldIndex("rate_bps")),
        r.getDouble(r.fieldIndex("default_rate")))
    }.distinct
    require(ps.length == 1, s"inconsistent meta under $dir")
    val p = ps.head
    Meta(p._1, p._2, p._3, p._4, p._5, p._6.zip(p._7).toMap, p._8,
      rows.map(_.getLong(rows.head.fieldIndex("max_doc_id"))).max)
  }

  private def writeMeta(spark: SparkSession, dir: String, m: Meta,
                        overwrite: Boolean): Unit = {
    import spark.implicits._
    val (grps, rs) = m.rates.toSeq.sortBy(_._1).unzip
    Seq((m.k, m.threshold, m.maxDf, m.deconN, m.nBuckets, grps, rs,
        m.defaultRate, m.maxDocId))
      .toDF("shingle_k", "threshold", "max_df", "decon_n", "n_buckets",
        "rate_grps", "rate_bps", "default_rate", "max_doc_id")
      .coalesce(1)
      .write.mode(if (overwrite) "overwrite" else "append")
      .parquet(s"$dir/meta")
  }

  /** Latest version of a `v=K/`-versioned artifact, counting only
    * versions PUBLISHED by their write job's `_SUCCESS` marker — a
    * torn version directory (crash mid-write) is invisible to
    * readers even before [[graft.sources.CommitLog.recover]] removes
    * it. */
  private def latestV(fs: org.apache.hadoop.fs.FileSystem,
                      dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val vs = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(s"$dir/v=$v/_SUCCESS")))
    require(vs.nonEmpty, s"no published version under $dir")
    vs.max
  }

  /** The store's current pair/label version — the two artifacts
    * version in lockstep (pairs then labels per increment), so a
    * mismatch means a torn DIRECT-API increment: fail fast and name
    * the repair rather than serve a pair graph against another
    * version's components. */
  private def currentV(spark: SparkSession, dir: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val vp = latestV(fs, s"$dir/pairs")
    val vl = latestV(fs, s"$dir/labels")
    require(vp == vl,
      s"torn pair/label versions under $dir ($vp vs $vl): " +
        "run graft.sources.CommitLog.recover, or re-run the increment " +
        "under the streaming wrapper's journal")
    vp
  }

  /** Run independent driver actions as CONCURRENT Spark jobs (one
    * thread each; Spark's scheduler interleaves them across the same
    * executors), awaiting all and rethrowing the first failure. The
    * increment's cost at increment grain is dominated by sequential
    * JOB LAUNCHES, not data — batching the independent artifact
    * appends into concurrent groups cuts the barrier count, which is
    * the fixed overhead the SCALING ratios showed. */
  private def inParallel(actions: Seq[() => Unit]): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = actions.map(a => new Thread(() =>
      try a() catch { case t: Throwable => errs.add(t); () }))
    ts.foreach(_.start())
    ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }

  private def bucketed(df: DataFrame, nBuckets: Int): DataFrame =
    df.withColumn("bucket",
      pmod(xxhash64(col("shingle")), lit(nBuckets)).cast("int"))

  private def docBucketed(df: DataFrame, nBuckets: Int): DataFrame =
    df.withColumn("bucket",
      pmod(xxhash64(col("doc_id")), lit(nBuckets)).cast("int"))

  /** [[prunedByShingle]]'s doc-keyed twin over the `postd/` dual
    * layout: static partition pruning by the filter docs' buckets,
    * then the broadcast semi join. */
  private def prunedByDoc(table: DataFrame, docs: DataFrame,
                          nBuckets: Int): DataFrame = {
    val bks = docBucketed(docs, nBuckets)
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    table.filter(col("bucket").isin(bks: _*))
      .join(broadcast(docs), Seq("doc_id"), "left_semi")
  }

  /** Map-side broadcast-filtered read of a shingle-bucketed artifact:
    * statically prunes to the filter set's buckets (driver-collected
    * bucket ids, <= nBuckets values) then semi-joins the broadcast
    * increment-grain shingle set. */
  private def prunedByShingle(table: DataFrame, shingles: DataFrame,
                              nBuckets: Int): DataFrame = {
    val bks = bucketed(shingles, nBuckets)
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    table.filter(col("bucket").isin(bks: _*))
      .join(broadcast(shingles), Seq("shingle"), "left_semi")
  }

  /** Exact-dedup survivors of `df` (quality gate + min-id-per-hash),
    * with the text hash riding along. */
  private def exSurvivors(df: DataFrame): DataFrame = {
    val q = df.filter(TextFeatures.qualityKeep(col("text")))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        xxhash64(col("text")).as("h"))
    val keep = q.groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    q.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Per-doc intrinsic rows for `exdocs/`: decon flag vs the eval
    * shingle set and the distinct-shingle-set size — both computed for
    * EVERY survivor at ingest (they depend only on the doc's own text,
    * so a doc that resurrects when a cluster splits, or that enters a
    * pair via a later batch, needs no text rescan). */
  private def intrinsics(ex: DataFrame, evalsh: DataFrame,
                         deconN: Int, shingleK: Int): DataFrame = {
    val flagged = ex.select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), deconN)).as("g"))
      .join(broadcast(evalsh), Seq("g"))
      .select("doc_id").distinct().withColumn("dflag", lit(1))
    ex.select(col("doc_id"), col("lang"), col("source"),
        size(graft.functions.WordShingles(col("text"), shingleK))
          .cast("long").as("sz"))
      .join(flagged, Seq("doc_id"), "left")
      .na.fill(0, Seq("dflag"))
  }

  /** Jaccard threshold over pair intersections + per-doc set sizes —
    * [[graft.dedup.Dedup.jaccardPairs]]'s tail, the same raw-double
    * comparison bit-for-bit. */
  private def thresholdPairs(inter: DataFrame, sizes: DataFrame,
                             threshold: Double): DataFrame =
    inter
      .join(sizes.toDF("d1", "sz1"), Seq("d1"))
      .join(sizes.toDF("d2", "sz2"), Seq("d2"))
      .filter(col("inter").cast("double")
        / (col("sz1") + col("sz2") - col("inter")) >= threshold)
      .select("d1", "d2")

  /** Pair evidence from full posting lists ([[graft.dedup.Dedup
    * .jaccardPairs]]'s body over precomputed postings — same df cap). */
  private def pairsFrom(post: DataFrame, sizes: DataFrame, maxDf: Long,
                        threshold: Double): DataFrame =
    thresholdPairs(
      Postings.coPairs(post, Seq(col("shingle")), col("doc_id"), maxDf)
        .withColumnRenamed("shared", "inter"),
      sizes, threshold)

  /** The corpus sample served from the artifacts: near-dup canonical
    * keep (labels join), decon gate, deterministic stratified
    * sampling — output (doc_id, lang, source), the 31g contract. */
  def assemble(spark: SparkSession, dir: String): DataFrame =
    assembleAt(spark, dir, readMeta(spark, dir), currentV(spark, dir))

  /** [[assemble]] with the meta row and pair/label version already in
    * hand — the increment's tail calls this directly so the store's
    * meta and version directories are not re-read and re-listed by
    * the very call that just wrote them. */
  private def assembleAt(spark: SparkSession, dir: String, m: Meta,
                         v: Long): DataFrame = {
    val kept = spark.read.parquet(s"$dir/exdocs")
      .join(spark.read.parquet(s"$dir/labels/v=$v")
        .withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .filter(coalesce(col("component"), col("doc_id")) === col("doc_id"))
      .filter(col("dflag") === 0)
    TextFeatures.sampleStratified(kept, col("doc_id"), col("lang"),
        m.rates, m.defaultRate)
      .select("doc_id", "lang", "source")
  }

  /** Full build over `base`, persisting every artifact under `dir`
    * (all dirs overwritten — a rebuild resets the store). Returns the
    * assembled corpus output (== [[CorpusBuild.run]] over `base`). */
  def build(base: DataFrame, eval: DataFrame, dir: String,
            shingleK: Int = 3, threshold: Double = 0.5,
            maxDf: Long = 1000L, deconN: Int = 8,
            rates: Map[String, Double] = Map.empty,
            defaultRate: Double = 1.0, nBuckets: Int = 64): DataFrame = {
    val spark = base.sparkSession
    val ex = exSurvivors(base).persist(lvl)
    ex.count()
    ex.select(col("h"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/hidx")
    val arr = ex.select(col("doc_id"),
        graft.functions.WordShingles(col("text"), shingleK).as("shs"))
      .filter(size(col("shs")) > 0).persist(lvl)
    arr.count()
    val post = arr.select(col("doc_id"), explode(col("shs")).as("shingle"))
    // repartition on the partition column: ONE file per bucket —
    // without it every task writes into every bucket dir (tasks x
    // buckets small files) and all later artifact scans pay the
    // listing/footer cost (the BucketMaintenance write shape)
    bucketed(post, nBuckets).repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(s"$dir/post")
    // the DUAL doc-bucketed copy: shingle-keyed probes (df lookups,
    // postings of band-relevant shingles) prune post/; doc-keyed
    // probes (the affected-doc full postings) prune postd/ — both
    // access patterns are static partition prunes, at 2x linear
    // storage (the standard dual-index trade)
    docBucketed(post, nBuckets).repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(s"$dir/postd")
    bucketed(post.groupBy("shingle").agg(count(lit(1)).as("df")), nBuckets)
      .repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(s"$dir/df")
    eval.select(explode(
        graft.functions.WordShingles(col("text"), deconN)).as("g"))
      .distinct().write.mode("overwrite").parquet(s"$dir/evalsh")
    intrinsics(ex, spark.read.parquet(s"$dir/evalsh"), deconN, shingleK)
      .write.mode("overwrite").parquet(s"$dir/exdocs")
    val sizes = arr.select(col("doc_id"), size(col("shs")).cast("long").as("sz"))
    // a rebuild resets the versioned artifacts outright (stale higher
    // versions from a previous store generation must not outrank v=0)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Seq("pairs", "labels").foreach(a =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$a"), true))
    pairsFrom(post, sizes, maxDf, threshold)
      .write.parquet(s"$dir/pairs/v=0")
    val pairs = spark.read.parquet(s"$dir/pairs/v=0")
    labelsOf(spark, pairs).write.parquet(s"$dir/labels/v=0")
    val maxId = base.agg(max(col("doc_id"))).head()
    require(!maxId.isNullAt(0), "empty base corpus")
    val meta = Meta(shingleK, threshold, maxDf, deconN, nBuckets,
      rates, defaultRate, maxId.getLong(0))
    writeMeta(spark, dir, meta, overwrite = true)
    ex.unpersist(blocking = false)
    arr.unpersist(blocking = false)
    assembleAt(spark, dir, meta, 0L)
  }

  private def labelsOf(spark: SparkSession, edges: DataFrame): DataFrame =
    if (edges.isEmpty) {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("node", "component")
    } else ConnectedComponents.run(
      edges.select(col("d1").as("src"), col("d2").as("dst")))

  /** Periodic artifact maintenance — the store-side twin of
    * [[graft.text.Bm25Index.compact]]: every increment appends one
    * part per touched artifact, so at crawl cadence the stores accrete
    * files (and `df/`, the ADDITIVE artifact, accretes one row per
    * (shingle, batch) whose sum every read re-aggregates). Compaction
    * folds each fragmented df bucket by SUMMING its rows per shingle —
    * the same associative merge reads already perform, so every later
    * read, increment, and [[assemble]] is bit-identical before/after
    * (CorpusIncrementSpec pins it by running the same next batch
    * through a compacted and an uncompacted clone) — and re-files the
    * disjoint-row stores (post/hidx/exdocs: batch slices never overlap
    * by construction, so theirs is pure file folding). pairs/labels
    * are rewritten whole by every increment and need nothing. */
  def compact(spark: SparkSession, dir: String, minParts: Int = 2,
              targetFiles: Int = 1): Unit = {
    // plan first, then run every rewrite under ONE rewrite journal
    // (CommitLog.rewriting): a kill inside any overwrite's
    // delete-then-rename commit window restores the backed-up
    // originals byte-for-byte instead of tearing an artifact (r13).
    // Backup cost = the fragmented slice being rewritten — the same
    // order as the rewrite itself.
    def frag(t: String) = graft.sources.BucketMaintenance
      .fragmentedBuckets(spark, s"$dir/$t", minParts)
    val (fDf, fPost, fPostd) = (frag("df"), frag("post"), frag("postd"))
    val folds = Seq("hidx", "exdocs").filter(t =>
      spark.read.parquet(s"$dir/$t").inputFiles.length >=
        minParts + targetFiles - 1)
    val metaFold =
      spark.read.parquet(s"$dir/meta").inputFiles.length >= minParts
    val backup =
      fDf.map(b => s"df/bucket=$b") ++ fPost.map(b => s"post/bucket=$b") ++
        fPostd.map(b => s"postd/bucket=$b") ++ folds ++
        (if (metaFold) Seq("meta") else Nil)
    // rename-displacing journal (r14): every rewrite stages its fully
    // materialized replacement FIRST, then the fragmented slices are
    // displaced into the undo by rename — the copy-based backup paid
    // a second full write of exactly the data being compacted
    if (backup.nonEmpty) graft.sources.CommitLog.rewritingStaged(
      spark, dir, backup)({
      val sDf = graft.sources.BucketMaintenance.stageRewrite(spark,
        s"$dir/df", fDf,
        _.groupBy("shingle", "bucket").agg(sum(col("df")).as("df"))
          .select("shingle", "df", "bucket"))
      val sPost = graft.sources.BucketMaintenance.stageRewrite(spark,
        s"$dir/post", fPost)
      val sPostd = graft.sources.BucketMaintenance.stageRewrite(spark,
        s"$dir/postd", fPostd)
      // hidx/exdocs are unbucketed: fold to `targetFiles` (corpus-scale
      // callers size it to keep files executor-memory-shaped; the
      // default 1 is the registry/test scale)
      val sFolds = folds.map { t =>
        val (snap, rdd) = Rounds.materialize(
          spark.read.parquet(s"$dir/$t").coalesce(targetFiles), lvl)
        rdd.count()
        (t, snap, rdd)
      }
      // meta folds to one row: same params (enforced), running max id
      val mMeta = if (metaFold) Some(readMeta(spark, dir)) else None
      (Seq(sDf, sPost, sPostd).flatten, sFolds, mMeta)
    }) { case (staged, sFolds, mMeta) =>
      staged.foreach(graft.sources.BucketMaintenance.publishRewrite(spark, _))
      sFolds.foreach { case (t, snap, rdd) =>
        snap.write.mode("overwrite").parquet(s"$dir/$t")
        rdd.unpersist(blocking = false)
      }
      mMeta.foreach(m => writeMeta(spark, dir, m, overwrite = true))
    }
    // retire superseded pair/label VERSION directories AFTER the
    // journal closes (each increment publishes a fresh v=K and deletes
    // nothing, so sub-latest versions accumulate between compactions
    // exactly like small parts do; they are garbage under any outcome,
    // so they need no undo coverage)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val vCur = currentV(spark, dir)
    Seq("pairs", "labels").foreach { a =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$a")).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v=") &&
          s.getPath.getName.stripPrefix("v=").toLong != vCur)
        // != not <: a dir ABOVE vCur is a torn increment's unpublished
        // debris (a PUBLISHED higher version in one artifact would
        // have made currentV above throw its lockstep repair message),
        // so compaction clears it rather than leaving it to the
        // retrying increment's overwrite
        .foreach(s => fs.delete(s.getPath, true))
    }
  }

  /** Fold one crawl batch into the artifacts and return the updated
    * corpus output — hash-identical to `build(base ∪ batch)`. */
  def increment(batch: DataFrame, dir: String): DataFrame = {
    val spark = batch.sparkSession
    val m = readMeta(spark, dir)
    // resolve the pair/label version first (fails fast on a torn
    // direct-API store). The increment itself deletes NOTHING — not
    // even superseded version directories (compact retires those) —
    // so the journal's undo-by-delete restores the pre-batch store
    // EXACTLY and the file census is the crash-recovery invariant the
    // stream spec pins byte-for-byte.
    val v = currentV(spark, dir)
    val bMin = batch.agg(min(col("doc_id")), max(col("doc_id"))).head()
    if (bMin.isNullAt(0)) return assemble(spark, dir)
    require(bMin.getLong(0) > m.maxDocId,
      s"batch ids must exceed indexed ids (min ${bMin.getLong(0)} <= " +
        s"${m.maxDocId}): out-of-order ingest would break min-id dedup parity")

    // ---- exact stage: in-batch min-id dedup, then the index probe.
    // dup hashes come from a map-side semi of hidx against the
    // broadcast batch hash set (never a shuffle of the index). bx is
    // RE-ROOTED on a persisted RDD, not just cached: the hidx append
    // below triggers Spark's refreshByPath recache, and a merely
    // cached bx (whose plan READS hidx) would re-execute against the
    // just-appended index and dedup the whole batch against itself.
    val bq = exSurvivors(batch)
    val hidx = spark.read.parquet(s"$dir/hidx")
    val dupH = hidx.join(broadcast(bq.select("h").distinct()),
      Seq("h"), "left_semi").select("h").distinct()
    val (bx, bxRdd) = Rounds.materialize(
      bq.join(broadcast(dupH), Seq("h"), "left_anti"), lvl)
    val nBatch = bxRdd.count()

    // ---- increment-grain execution profile: from here to the version
    // publish every stage carries BATCH-sized data (bounded-batch
    // contract) or a batch-pruned sliver of the store, where a
    // corpus-sized shuffle width is pure task-scheduling latency and
    // AQE's per-stage replanning adds a driver round-trip per stage
    // with nothing to re-plan. For small batches the session briefly
    // narrows to 8 shuffle partitions with AQE off (restored in the
    // finally below) — physical-execution knobs only, the output is
    // bit-identical, and the sf0.1 orchestration floor measured
    // ~10.5 -> ~7.7 s. Large batches keep the session's own width
    // (and AQE's skew handling) untouched.
    val narrow = nBatch <= 200000L
    val savedShuf = spark.conf.get("spark.sql.shuffle.partitions")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    if (narrow) {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    }
    try {

    // ---- append the batch's slices of every additive artifact
    // increment-grain appends: one file each (coalesce / bucket
    // repartition), so the store's file count grows with BATCHES, not
    // batches x tasks x buckets. The five appends are INDEPENDENT
    // given bx, so they run as two concurrent groups instead of five
    // sequential jobs (group 1 also warms the shingle cache the
    // postings group consumes): the r12 verdict measured the
    // increment's cost as ~20 sequential job launches, not data.
    val bArr = bx.select(col("doc_id"),
        graft.functions.WordShingles(col("text"), m.k).as("shs"))
      .filter(size(col("shs")) > 0).persist(lvl)
    val bPost = bArr.select(col("doc_id"), explode(col("shs")).as("shingle"))
    val dfB = bPost.groupBy("shingle").agg(count(lit(1)).as("df")).persist(lvl)
    // ONE six-way concurrent group (r14; r12 ran it as two batches of
    // three): every append is independent given bx, and the shared
    // bArr/dfB caches are computed exactly once under the block
    // manager's per-block locks whichever job gets there first — the
    // explicit bArr.count() rides along so the cache warms even while
    // the hidx/exdocs writes (which don't consume it) hold two slots
    inParallel(Seq(
      () => bx.select(col("h"), col("doc_id"))
        .coalesce(1).write.mode("append").parquet(s"$dir/hidx"),
      () => intrinsics(bx, spark.read.parquet(s"$dir/evalsh"), m.deconN, m.k)
        .coalesce(1).write.mode("append").parquet(s"$dir/exdocs"),
      () => { bArr.count(); () },
      () => bucketed(bPost, m.nBuckets).repartition(col("bucket"))
        .write.mode("append")
        .partitionBy("bucket").parquet(s"$dir/post"),
      () => docBucketed(bPost, m.nBuckets).repartition(col("bucket"))
        .write.mode("append")
        .partitionBy("bucket").parquet(s"$dir/postd"),
      // populates the dfB cache the band analysis below consumes
      () => bucketed(dfB, m.nBuckets).repartition(col("bucket"))
        .write.mode("append")
        .partitionBy("bucket").parquet(s"$dir/df")))

    // ---- df-band analysis over batch-present shingles (reads INCLUDE
    // the just-appended parts, so the summed df is already the new
    // state; the old state is new minus the batch's own part)
    val dfAll = spark.read.parquet(s"$dir/df")
    val postAll = spark.read.parquet(s"$dir/post")
    val bands = prunedByShingle(dfAll, dfB.select("shingle"), m.nBuckets)
      .groupBy("shingle").agg(sum(col("df")).as("_dfn"))
      .join(dfB, Seq("shingle"))
      .withColumn("_in_new", col("_dfn").between(2, m.maxDf))
      .withColumn("_in_old", (col("_dfn") - col("df")).between(2, m.maxDf))
      .persist(lvl)

    // ---- exact pair recomputation, split by what CAN change.
    // Band-CROSSING shingles (in-band status flipped by the batch) are
    // the only ones that can alter base-vs-base evidence — a doc's
    // shingle set never changes, so a stays-in-band shingle's
    // contribution to any base-base intersection is fixed. Their
    // postings docs plus the batch form the full-recompute set C;
    // everything else either rides through or is a NEW base×batch
    // pair. This split is what keeps the increment increment-grain
    // even on vocabulary-dense corpora where most shingles are shared:
    // stays-in shingles (the common case) cost only their base×batch
    // cross products, never a base-base re-expansion.
    val changed = bands.filter(col("_in_new") =!= col("_in_old"))
      .select("shingle")
    val cDocs = prunedByShingle(postAll, changed, m.nBuckets)
      .select("doc_id")
      .union(bx.select("doc_id")).distinct().persist(lvl)
    // (a) pairs WITHIN C: complete postings of C docs — a STATICALLY
    // PRUNED read of the doc-bucketed dual layout (C's bucket ids are
    // driver-collected, <= nBuckets), true new-state bands for ALL
    // their shingles (df/ summed for exactly those shingles)
    val cPost = prunedByDoc(spark.read.parquet(s"$dir/postd"), cDocs,
      m.nBuckets).persist(lvl)
    val ibC = prunedByShingle(dfAll, cPost.select("shingle").distinct(),
        m.nBuckets)
      .groupBy("shingle").agg(sum(col("df")).as("_dfn"))
      .filter(col("_dfn").between(2, m.maxDf)).select("shingle")
    val interA = Postings.coPairs(
        cPost.join(broadcast(ibC), Seq("shingle"), "left_semi"),
        Seq(col("shingle")), col("doc_id"), Long.MaxValue)
      .withColumnRenamed("shared", "inter")
    // (b) NEW (base ∉ C) × batch pairs through batch-present in-band
    // shingles: every shared in-band shingle of such a pair is
    // batch-present, so the per-shingle cross expansion counts the
    // exact intersection; d1 < d2 holds because batch ids exceed all
    // base ids by contract. Disjoint from (a) (exactly one endpoint in
    // C) and from keptOld (no old pair has a batch endpoint).
    val relIb = bands.filter(col("_in_new")).select("shingle")
    val interB = prunedByShingle(postAll, relIb, m.nBuckets)
      .withColumn("_b", col("doc_id") > m.maxDocId)
      .join(broadcast(cDocs.withColumn("_c", lit(1))), Seq("doc_id"), "left")
      .groupBy("shingle")
      .agg(collect_list(when(!col("_b") && col("_c").isNull,
          col("doc_id"))).as("_bl"),
        collect_list(when(col("_b"), col("doc_id"))).as("_xl"))
      .filter(size(col("_bl")) > 0 && size(col("_xl")) > 0)
      .select(explode(col("_bl")).as("d1"), col("_xl"))
      .select(col("d1"), explode(col("_xl")).as("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    // set sizes are per-doc intrinsics persisted at ingest — no
    // posting pull for cross-pair endpoints
    val sizes = spark.read.parquet(s"$dir/exdocs")
      .select(col("doc_id"), col("sz"))
    val newPairs = thresholdPairs(interA.unionByName(interB), sizes,
      m.threshold).persist(lvl)

    // ---- splice the pair graph: pairs with BOTH endpoints in C are
    // replaced by recomputation (a); (b) adds pairs no old pair could
    // be; every other old pair is provably unchanged and rides through
    val oldPairs = spark.read.parquet(s"$dir/pairs/v=$v")
    val cD = (side: String) => cDocs.toDF(side)
    val keptOld = oldPairs
      .join(broadcast(cD("d1").withColumn("_a1", lit(1))), Seq("d1"), "left")
      .join(broadcast(cD("d2").withColumn("_a2", lit(1))), Seq("d2"), "left")
      .filter(col("_a1").isNull || col("_a2").isNull)
      .select("d1", "d2")
    val finalPairs = keptOld.unionByName(newPairs)

    // ---- re-solve ONLY old components touching docs whose pair
    // evidence could have changed — C plus the new pairs' endpoints
    // (the 23e quotient idea, generalized to handle edge REMOVALS by
    // re-solving each touched component from its final edge set).
    // finalPairs and the subgraph are each COMPUTED once: fp's
    // persisted RDD is populated en route to the subgraph count below
    // (no separate count job), then every later consumer (union-find,
    // the pairs write) scans the cache.
    val (fp, fpRdd) = Rounds.materialize(finalPairs, lvl)
    val pairEnds = cDocs
      .union(newPairs.select(col("d1").as("doc_id")))
      .union(newPairs.select(col("d2").as("doc_id"))).distinct()
    val oldLabels = spark.read.parquet(s"$dir/labels/v=$v")
    val touched = oldLabels
      .join(broadcast(pairEnds.toDF("node")), Seq("node"), "left_semi")
      .select("component").distinct()
    val subNodes = oldLabels
      .join(broadcast(touched), Seq("component"), "left_semi")
      .select("node")
      .union(pairEnds.toDF("node")).distinct()
    val (se, seRdd) = Rounds.materialize(
      fp.join(broadcast(subNodes.toDF("d1")), Seq("d1"), "left_semi"), lvl)
    val nSub = seRdd.count()
    // solve the touched subgraph where it lives: an increment-grain
    // splice is usually a few thousand edges, for which the
    // distributed star rounds cost ~10 job launches of pure overhead —
    // below an explicit driver-size cap (500k edges ≈ tens of MB) one
    // collect + a local union-find replaces them, emitting the same
    // (node, min-id component) labels bit-for-bit; past the cap the
    // distributed path takes over unchanged
    val subLabels =
      if (nSub == 0) {
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("node", "component")
      } else if (nSub <= 500000L) {
        import spark.implicits._
        val es = se.select(col("d1"), col("d2")).as[(Long, Long)].collect()
        val parent = new java.util.HashMap[Long, Long]()
        def find(a: Long): Long = {
          var x = a
          while (parent.getOrDefault(x, x) != x) {
            parent.put(x, parent.getOrDefault(parent.get(x), parent.get(x)))
            x = parent.get(x)
          }
          x
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
        }
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        // root compression gives min-id labels directly: unions always
        // point the larger root at the smaller, so every chain ends at
        // its component's minimum id
        nodes.map(n => (n, find(n))).toSeq.toDF("node", "component")
      } else
        // size the CC rounds to the subgraph: big graphs get a
        // partition per ~1M edges
        ConnectedComponents.run(
          se.select(col("d1").as("src"), col("d2").as("dst"))
            .repartition(math.max(1, (nSub / 1000000L).toInt)))
    val newLabels = oldLabels
      .join(broadcast(touched), Seq("component"), "left_anti")
      .unionByName(subLabels)

    // the replacement pair graph and labels land as the NEXT version
    // directory — fresh paths, so neither write overwrites a path its
    // own plan reads (the refreshByPath hazard the pre-versioning code
    // paid an extra materialization barrier to dodge), a torn write is
    // invisible (no _SUCCESS -> not a published version), and the two
    // writes are independent given the persisted fp/se, so they run
    // concurrently
    // mode("overwrite") so a RETRY after a torn v=K+1 write (direct-API
    // crash mid-job: an unpublished dir with no _SUCCESS, invisible to
    // latestV but present on disk) replaces the debris instead of
    // failing ErrorIfExists' "path already exists" — which would wedge
    // every future increment until manual deletion
    inParallel(Seq(
      () => fp.write.mode("overwrite").parquet(s"$dir/pairs/v=${v + 1}"),
      () => newLabels.write.mode("overwrite").parquet(s"$dir/labels/v=${v + 1}")))
    fpRdd.unpersist(blocking = false)
    seRdd.unpersist(blocking = false)

    writeMeta(spark, dir, m.copy(maxDocId = bMin.getLong(1)),
      overwrite = false)
    bxRdd.unpersist(blocking = false)
    bArr.unpersist(blocking = false)
    bands.unpersist(blocking = false)
    cPost.unpersist(blocking = false)
    newPairs.unpersist(blocking = false)
    dfB.unpersist(blocking = false)
    cDocs.unpersist(blocking = false)
    // serve from the version this increment just published — the meta
    // row and the v+1 lockstep are already in hand, so no re-read
    assembleAt(spark, dir, m.copy(maxDocId = bMin.getLong(1)), v + 1)
    } finally {
      if (narrow) {
        spark.conf.set("spark.sql.shuffle.partitions", savedShuf)
        spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      }
    }
  }
}
