package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

/** INCREMENTAL dataset card — [[DatasetCard.card]]'s one-row release
  * summary computable over any ingest range WITHOUT rescanning the
  * corpus (the composition the now-complete sketch family exists for):
  * each ingest batch appends ONE part row holding
  *
  *  - the ADDITIVE masses (doc/token/char/quality-keep counts and the
  *    per-language token mix) — associative integer sums, so the
  *    assembled figures are EXACT and replay in plain SQL (q_icard's
  *    oracle recomputes them one-shot over the raw table);
  *  - a mergeable HLL sketch of the text hash (the 7i2 artifact) for
  *    distinct-text / dup mass — an ESTIMATE by contract (a
  *    stream-built sketch estimates via HIP, a union via the composite
  *    estimator, so cross-path bit parity is not claimed; CardStoreSpec
  *    pins the error bound vs the exact count plus union-path
  *    determinism through compaction), hence kept OUT of the
  *    SQL-oracled registry columns;
  *  - the bottom-k quantile sketch of per-doc token counts (the 7i4
  *    join-semilattice) for length percentiles — union == one-shot
  *    BIT-EXACTLY, and the splitmix64 priorities replay in DuckDB
  *    HUGEINT, so these columns ARE SQL-oracled (the q_qsk chain).
  *
  * Release-over-release corpus CI therefore diffs cards from
  * parts-grain reads: a part is one row + two fixed-size sketches
  * however large its batch, assembly cost scales with the number of
  * batches (then [[compact]] folds that down to one row, serving
  * pinned identical), and the raw corpus is never rescanned. At
  * 100 TB the card becomes a metadata read.
  *
  * Append idempotence is the caller's stream contract (wrap in the
  * 21w/30s4 foreachBatch patterns or the CommitLog journal). */
object CardStore {

  val DefaultLangs: Seq[String] = Seq("en", "zh", "de", "es", "fr")

  private def partRow(df: DataFrame, id: Column, text: Column, lang: Column,
                      langs: Seq[String], k: Int, lgK: Int): DataFrame = {
    val base = df.select(id.as("_id"), text.as("_t"), lang.as("_l"),
      size(split(text, "\\s+")).cast("long").as("_tok"),
      TextFeatures.qualityKeep(text).cast("long").as("_keep"),
      xxhash64(text).as("_h"))
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("n_docs"),
      sum(col("_tok")).as("n_tokens"),
      sum(length(col("_t")).cast("long")).as("n_chars"),
      sum(col("_keep")).as("keep_docs"),
      hll_sketch_agg(col("_h"), lit(lgK)).as("hll"),
      QuantileSketch.sketchAgg(col("_id"), col("_tok").cast("double"), k)
        .getField("entries").as("_sk")) ++
      langs.map(l =>
        sum(when(col("_l") === l, col("_tok")).otherwise(0L)).as(s"${l}_tokens"))
    base.agg(aggs.head, aggs.tail: _*)
      .withColumn("smp", transform(col("_sk"),
        x => struct(x.getField("_1").as("pri"), x.getField("_2").as("v"))))
      .drop("_sk")
  }

  /** Append one batch's card part under `dir`: one row, one file —
    * the batch pays one map-side-combined corpus pass and is never
    * read again. An empty batch appends nothing (its global aggregate
    * would be a row of NULL sums, which would poison the fold). */
  def append(df: DataFrame, id: Column, text: Column, lang: Column,
             dir: String, langs: Seq[String] = DefaultLangs,
             k: Int = 64, lgK: Int = 12): Unit =
    if (!df.isEmpty)
      partRow(df, id, text, lang, langs, k, lgK)
        .coalesce(1).write.mode("append").parquet(dir)

  /** The assembled card over every persisted part (filter the parts
    * read upstream for a sub-range): exact additive figures +
    * keep_rate + the token-length percentiles (all SQL-replayable),
    * plus the HLL members (`n_distinct_texts_approx`,
    * `dup_ratio_approx` — estimates, spec-pinned). One parts-grain
    * aggregate; the corpus is not touched. */
  def card(spark: SparkSession, dir: String,
           langs: Seq[String] = DefaultLangs, k: Int = 64,
           percents: Seq[Int] = Seq(50, 95)): DataFrame = {
    val parts = spark.read.parquet(dir)
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("n_parts"),
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      sum(col("keep_docs")).as("_kd"),
      hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
        .as("n_distinct_texts_approx"),
      QuantileSketch.unionAgg(col("smp"), k).as("smp")) ++
      langs.map(l => sum(col(s"${l}_tokens")).as(s"${l}_tokens"))
    val merged = parts.agg(aggs.head, aggs.tail: _*)
      .withColumn("keep_rate", graft.functions.Numeric.cround(
        col("_kd").cast("double") / col("n_docs"), 6))
      .withColumn("other_tokens",
        col("n_tokens") - langs.map(l => col(s"${l}_tokens")).reduce(_ + _))
      .withColumn("dup_ratio_approx", graft.functions.Numeric.cround(
        lit(1.0) - col("n_distinct_texts_approx").cast("double")
          / col("n_docs"), 6))
      .withColumn("m",
        size(col("smp")).as("m"))
    percents.foldLeft(merged) { (df, p) =>
      df.withColumn(s"tok_p$p", QuantileSketch.percentileOf(col("smp"), p))
    }.drop("smp", "_kd")
  }

  /** Fold every part into ONE part row with the same schema — the
    * store's 35-story maintenance: sums of sums, a lossless HLL
    * union kept in sketch form, and the semilattice sample union, so
    * [[card]] is bit-identical before/after (CardStoreSpec).
    * Crash-atomic (r14): the fold appends a new part and retires the
    * old parts under the store's rewrite journal — the journal root
    * is never overwritten, so a kill at any point recovers the exact
    * pre-compaction part set (CardStoreSpec crash injection). */
  def compact(spark: SparkSession, dir: String,
              langs: Seq[String] = DefaultLangs, k: Int = 64,
              minParts: Int = 2): Unit = {
    val parts = spark.read.parquet(dir)
    if (parts.inputFiles.length < minParts) return
    val aggs: Seq[Column] = Seq(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      sum(col("keep_docs")).as("keep_docs"),
      hll_union_agg(col("hll"), lit(false)).as("hll"),
      QuantileSketch.unionAgg(col("smp"), k).as("smp")) ++
      langs.map(l => sum(col(s"${l}_tokens")).as(s"${l}_tokens"))
    val folded = parts.agg(aggs.head, aggs.tail: _*)
      .select(parts.columns.map(col): _*) // pin the part column order
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
    // staged journal: the fold materializes first, the old parts are
    // DISPLACED into the undo journal by rename (no second write of
    // the store), and the fold publishes as a fresh appended part —
    // never a whole-table overwrite, which would delete the journal
    // root `dir/_ledger` (census + undo) along with the data and void
    // the crash-atomicity the journal provides
    graft.sources.CommitLog.rewritingStaged(spark, dir, files.toSeq)({
      val (snap, rdd) = graft.operators.Rounds.materialize(
        folded.coalesce(1),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.count() // fold fully computed before any file changes
      (snap, rdd)
    }) { case (snap, rdd) =>
      snap.write.mode("append").parquet(dir)
      rdd.unpersist(blocking = false)
    }
  }
}
