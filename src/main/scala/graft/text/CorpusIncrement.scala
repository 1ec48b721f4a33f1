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
  * Artifacts under `dir` (append-only except pairs/labels):
  *  - `hidx/`   (h = xxhash64(text), doc_id): exact-dedup index, one
  *    row per distinct surviving text (22a's artifact);
  *  - `post/`   (shingle, doc_id) for every exact-dedup survivor,
  *    partitioned by shingle-hash bucket;
  *  - `df/`     additive (shingle, df) parts — document frequency is a
  *    SUM over parts, so an append never rewrites old rows (the
  *    LSM/delta pattern; merge at read is an increment-grain groupBy);
  *  - `exdocs/` (doc_id, lang, source, dflag): per-doc INTRINSIC facts
  *    — decon flags are computed for every survivor at ingest (they
  *    depend only on doc text vs the fixed eval set), so a doc that
  *    resurrects when a cluster splits needs no text rescan;
  *  - `evalsh/` the eval suite's distinct decon n-grams (fixed size);
  *  - `pairs/`, `labels/` the near-dup pair graph and its components —
  *    the two REWRITTEN artifacts (pair evidence can be retracted, see
  *    below), both sparse (dup evidence, not corpus) so the rewrite is
  *    cheap;
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
  *  1. classify every batch-present shingle by old/new band status;
  *     only those shingles can change any pair (a doc's shingle set
  *     never changes), so the AFFECTED docs are their base postings
  *     plus the batch — increment-grain, maxDf-bounded per shingle;
  *  2. recompute pairs among affected docs exactly (their complete
  *     postings + true new-state bands); any pair with at most one
  *     affected endpoint is provably unchanged (a changed shared
  *     shingle would have made both endpoints affected) and rides
  *     through from `pairs/`;
  *  3. re-solve components only for old components touching affected
  *     docs (splits AND merges handled, because the subgraph is
  *     re-solved from its final edge set, not patched).
  *
  * Scale shape: no corpus-scale SHUFFLE anywhere on the increment
  * path. The corpus-scale artifacts are touched by map-side
  * broadcast-filtered scans only (hidx once, post twice, df twice,
  * exdocs once — the last is output-grain and inherent: the result IS
  * the whole corpus sample); shingle-bucket partition pruning kicks in
  * when a small batch touches few buckets (driver-collected bucket
  * ids, the 30l3 pattern). Every exchange is increment-grain.
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

  private def bucketed(df: DataFrame, nBuckets: Int): DataFrame =
    df.withColumn("bucket",
      pmod(xxhash64(col("shingle")), lit(nBuckets)).cast("int"))

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
    * shingle set, computed for EVERY survivor (resurrection-proof). */
  private def intrinsics(ex: DataFrame, evalsh: DataFrame,
                         deconN: Int): DataFrame = {
    val flagged = ex.select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), deconN)).as("g"))
      .join(broadcast(evalsh), Seq("g"))
      .select("doc_id").distinct().withColumn("dflag", lit(1))
    ex.select(col("doc_id"), col("lang"), col("source"))
      .join(flagged, Seq("doc_id"), "left")
      .na.fill(0, Seq("dflag"))
  }

  /** Pair evidence from postings + sizes — [[graft.dedup.Dedup
    * .jaccardPairs]]'s body over precomputed postings (same df cap,
    * same raw-double threshold comparison, bit-for-bit). `maxDf` is
    * the CAP when `post` carries full posting lists, or Long.MaxValue
    * when the band was already applied semantically (the increment's
    * restricted postings — their true dfs are checked upstream). */
  private def pairsFrom(post: DataFrame, sizes: DataFrame, maxDf: Long,
                        threshold: Double): DataFrame =
    Postings.coPairs(post, Seq(col("shingle")), col("doc_id"), maxDf)
      .withColumnRenamed("shared", "inter")
      .join(sizes.toDF("d1", "sz1"), Seq("d1"))
      .join(sizes.toDF("d2", "sz2"), Seq("d2"))
      .filter(col("inter").cast("double")
        / (col("sz1") + col("sz2") - col("inter")) >= threshold)
      .select("d1", "d2")

  /** The corpus sample served from the artifacts: near-dup canonical
    * keep (labels join), decon gate, deterministic stratified
    * sampling — output (doc_id, lang, source), the 31g contract. */
  def assemble(spark: SparkSession, dir: String): DataFrame = {
    val m = readMeta(spark, dir)
    val kept = spark.read.parquet(s"$dir/exdocs")
      .join(spark.read.parquet(s"$dir/labels")
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
    bucketed(post, nBuckets).write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(s"$dir/post")
    bucketed(post.groupBy("shingle").agg(count(lit(1)).as("df")), nBuckets)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(s"$dir/df")
    eval.select(explode(
        graft.functions.WordShingles(col("text"), deconN)).as("g"))
      .distinct().write.mode("overwrite").parquet(s"$dir/evalsh")
    intrinsics(ex, spark.read.parquet(s"$dir/evalsh"), deconN)
      .write.mode("overwrite").parquet(s"$dir/exdocs")
    val sizes = arr.select(col("doc_id"), size(col("shs")).cast("long").as("sz"))
    pairsFrom(post, sizes, maxDf, threshold)
      .write.mode("overwrite").parquet(s"$dir/pairs")
    val pairs = spark.read.parquet(s"$dir/pairs")
    labelsOf(spark, pairs).write.mode("overwrite").parquet(s"$dir/labels")
    val maxId = base.agg(max(col("doc_id"))).head()
    require(!maxId.isNullAt(0), "empty base corpus")
    writeMeta(spark, dir, Meta(shingleK, threshold, maxDf, deconN, nBuckets,
      rates, defaultRate, maxId.getLong(0)), overwrite = true)
    ex.unpersist(blocking = false)
    arr.unpersist(blocking = false)
    assemble(spark, dir)
  }

  private def labelsOf(spark: SparkSession, edges: DataFrame): DataFrame =
    if (edges.isEmpty) {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("node", "component")
    } else ConnectedComponents.run(
      edges.select(col("d1").as("src"), col("d2").as("dst")))

  /** Fold one crawl batch into the artifacts and return the updated
    * corpus output — hash-identical to `build(base ∪ batch)`. */
  def increment(batch: DataFrame, dir: String): DataFrame = {
    val spark = batch.sparkSession
    val m = readMeta(spark, dir)
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
    bxRdd.count()

    // ---- append the batch's slices of every additive artifact
    bx.select(col("h"), col("doc_id"))
      .write.mode("append").parquet(s"$dir/hidx")
    val bArr = bx.select(col("doc_id"),
        graft.functions.WordShingles(col("text"), m.k).as("shs"))
      .filter(size(col("shs")) > 0).persist(lvl)
    bArr.count()
    val bPost = bArr.select(col("doc_id"), explode(col("shs")).as("shingle"))
    bucketed(bPost, m.nBuckets).write.mode("append")
      .partitionBy("bucket").parquet(s"$dir/post")
    val dfB = bPost.groupBy("shingle").agg(count(lit(1)).as("df")).persist(lvl)
    dfB.count()
    bucketed(dfB, m.nBuckets).write.mode("append")
      .partitionBy("bucket").parquet(s"$dir/df")
    intrinsics(bx, spark.read.parquet(s"$dir/evalsh"), m.deconN)
      .write.mode("append").parquet(s"$dir/exdocs")

    // ---- df-band analysis over batch-present shingles (reads INCLUDE
    // the just-appended parts, so the summed df is already the new
    // state; the old state is new minus the batch's own part)
    val dfAll = spark.read.parquet(s"$dir/df")
    val postAll = spark.read.parquet(s"$dir/post")
    val bSh = dfB.select("shingle")
    val relevant = prunedByShingle(dfAll, bSh, m.nBuckets)
      .groupBy("shingle").agg(sum(col("df")).as("_dfn"))
      .join(dfB, Seq("shingle"))
      .withColumn("_dfo", col("_dfn") - col("df"))
      .filter(col("_dfo").between(2, m.maxDf)
        || col("_dfn").between(2, m.maxDf))
      .select("shingle")
    val affDocs = prunedByShingle(postAll, relevant, m.nBuckets)
      .select("doc_id")
      .union(bx.select("doc_id")).distinct().persist(lvl)
    affDocs.count()

    // ---- exact pair recomputation among affected docs: complete
    // postings (one map-side doc-filtered scan of post/), true
    // new-state bands (df/ summed for exactly those shingles)
    val affPost = postAll
      .join(broadcast(affDocs), Seq("doc_id"), "left_semi").persist(lvl)
    affPost.count()
    val affSh = affPost.select("shingle").distinct()
    val ibSh = prunedByShingle(dfAll, affSh, m.nBuckets)
      .groupBy("shingle").agg(sum(col("df")).as("_dfn"))
      .filter(col("_dfn").between(2, m.maxDf)).select("shingle")
    val sizes = affPost.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val newPairs = pairsFrom(
      affPost.join(broadcast(ibSh), Seq("shingle"), "left_semi"),
      sizes, Long.MaxValue, m.threshold)

    // ---- splice the pair graph: pairs with BOTH endpoints affected
    // are replaced by the recomputation; all others are provably
    // unchanged and ride through
    val oldPairs = spark.read.parquet(s"$dir/pairs")
    val affD = (side: String) => affDocs.toDF(side)
    val keptOld = oldPairs
      .join(broadcast(affD("d1").withColumn("_a1", lit(1))), Seq("d1"), "left")
      .join(broadcast(affD("d2").withColumn("_a2", lit(1))), Seq("d2"), "left")
      .filter(col("_a1").isNull || col("_a2").isNull)
      .select("d1", "d2")
    val finalPairs = keptOld.unionByName(newPairs)

    // ---- re-solve ONLY old components touching affected docs (the
    // 23e quotient idea, generalized to handle edge REMOVALS by
    // re-solving each touched component from its final edge set)
    val oldLabels = spark.read.parquet(s"$dir/labels")
    val touched = oldLabels
      .join(broadcast(affDocs.toDF("node")), Seq("node"), "left_semi")
      .select("component").distinct()
    val subNodes = oldLabels
      .join(broadcast(touched), Seq("component"), "left_semi")
      .select("node")
      .union(affDocs.toDF("node")).distinct()
    val subEdges = finalPairs
      .join(broadcast(subNodes.toDF("d1")), Seq("d1"), "left_semi")
    val newLabels = oldLabels
      .join(broadcast(touched), Seq("component"), "left_anti")
      .unionByName(labelsOf(spark, subEdges))

    // pairs/labels are rewritten (re-rooted on persisted RDDs first —
    // both plans read the paths they overwrite)
    val (fp, fpRdd) = Rounds.materialize(finalPairs, lvl)
    val (nl, nlRdd) = Rounds.materialize(newLabels, lvl)
    fpRdd.count(); nlRdd.count()
    fp.write.mode("overwrite").parquet(s"$dir/pairs")
    nl.write.mode("overwrite").parquet(s"$dir/labels")
    fpRdd.unpersist(blocking = false)
    nlRdd.unpersist(blocking = false)

    writeMeta(spark, dir, m.copy(maxDocId = bMin.getLong(1)),
      overwrite = false)
    bxRdd.unpersist(blocking = false)
    bArr.unpersist(blocking = false)
    dfB.unpersist(blocking = false)
    affDocs.unpersist(blocking = false)
    affPost.unpersist(blocking = false)
    assemble(spark, dir)
  }
}
