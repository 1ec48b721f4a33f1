package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL LM artifacts — the model-artifact member of the
  * incremental family (22a dedup index, 7i2/7i4 sketches, 30l3 BM25,
  * 31g3 corpus store): [[TextFeatures.charBigramEntropy]] re-counts
  * the whole corpus per run; this store pays the token-grain count
  * ONCE per ingest batch and persists one ADDITIVE (bigram, count)
  * part — counts are associative integer sums, so the model over any
  * batch range is the SUM of its parts, bit-equal to a one-shot count
  * over the concatenated corpus regardless of batching or merge order
  * (the df-parts argument of 31g3, here at model grain). Scoring from
  * the artifact therefore reproduces the direct query EXACTLY, which
  * is what lets q_ilm reuse q_entropy's DuckDB oracle verbatim.
  *
  * Scale shape: a part is ≤ 39² rows (the normalization alphabet caps
  * the gram space) however large the batch — the batch pays one
  * map-side-combined count aggregate and writes a fixed-size part;
  * model assembly reads parts-grain data (batches × ≤39² rows) and
  * collects the driver-sized sum; scoring is the fused map-only
  * BigramScore kernel pass. [[compact]] folds accumulated parts by
  * the same sum the reads perform (bit-identical serving,
  * spec-pinned). The model carries the smoothed unseen floor, so
  * serving docs with grams the corpus never produced is total — when
  * scoring the training corpus itself (the q_entropy parity case) the
  * floor is provably never consulted. */
object LmStore {

  private def normed(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", "#")

  /** One batch's additive part: (bg, c), ≤ 39² rows. */
  private def countPart(df: DataFrame, text: Column): DataFrame =
    df.select(normed(text).as("_t"))
      .filter(length(col("_t")) >= 2)
      .select(explode(graft.functions.BigramCounts(col("_t"))).as("_e"))
      .groupBy(col("_e.bg").as("bg")).agg(sum(col("_e.k")).as("c"))

  /** Count one batch and append its additive part: (bg, c), ≤ 39²
    * rows, one file. */
  def append(df: DataFrame, text: Column, dir: String): Unit =
    countPart(df, text).coalesce(1).write.mode("append").parquet(dir)

  /** The 35b-backed store variant: the SAME additive parts, published
    * through [[graft.sources.SnapshotStore]]'s versioned manifest —
    * so a reader resolved before a compaction keeps serving its exact
    * generation while maintenance runs (snapshot isolation, the
    * production step the journaled layout declares as single-writer
    * + recover-on-attach). The artifact semantics are untouched:
    * counts are associative sums, so the snapshot store's model is
    * bit-identical to the journaled store's over the same batches
    * (LmStoreSnapshotSpec pins it), and compaction folds by the very
    * sum serving performs. Space reclamation moves to
    * `SnapshotStore.retire`'s grace window. */
  def appendSnapshot(df: DataFrame, text: Column, dir: String): Unit =
    graft.sources.SnapshotStore.append(countPart(df, text), dir)

  /** [[model]] served from the manifest's CURRENT generation (the
    * whole read pins to that generation's exact file set). */
  def modelSnapshot(spark: SparkSession, dir: String): graft.functions.BigramModel =
    modelFrom(graft.sources.SnapshotStore.read(spark, dir))

  /** Fold the current generation to one part as a NEW generation —
    * in-flight readers keep theirs. */
  def compactSnapshot(spark: SparkSession, dir: String): Unit =
    graft.sources.SnapshotStore.compact(spark, dir,
      _.groupBy("bg").agg(sum(col("c")).as("c")))

  /** Fold the accumulated parts to one summed part — reads already
    * perform this sum, so serving is bit-identical before/after.
    * Crash-atomic (r14): the fold appends a new part and retires the
    * old parts under the store's rewrite journal (never a whole-table
    * overwrite, which would delete the journal root with the data),
    * so a kill at any point restores the store instead of losing the
    * model (LmStoreSpec crash injection). */
  def compact(spark: SparkSession, dir: String, minParts: Int = 2): Unit = {
    val cur = spark.read.parquet(dir)
    if (cur.inputFiles.length >= minParts) {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      // staged journal: fold materializes first, old parts displace
      // into the undo by rename, fold publishes as a fresh append —
      // never a whole-table overwrite, which would delete the journal
      // root with the data (see CardStore.compact)
      graft.sources.CommitLog.rewritingStaged(spark, dir, files.toSeq)({
        val (snap, rdd) = graft.operators.Rounds.materialize(
          cur.groupBy("bg").agg(sum(col("c")).as("c")).coalesce(1),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        rdd.count() // fold fully computed before any file changes
        (snap, rdd)
      }) { case (snap, rdd) =>
        snap.write.mode("append").parquet(dir)
        rdd.unpersist(blocking = false)
      }
    }
  }

  /** The driver-sized model from the summed parts — the same add-one
    * smoothing as [[TextFeatures.charBigramEntropy]], plus the unseen
    * floor ln(1/(tot+v)) so artifact serving is a total function. */
  def model(spark: SparkSession, dir: String): graft.functions.BigramModel =
    modelFrom(spark.read.parquet(dir))

  private def modelFrom(parts: DataFrame): graft.functions.BigramModel = {
    val counts = parts
      .groupBy("bg").agg(sum(col("c")).as("c")).collect()
    require(counts.nonEmpty, "empty LM store")
    val tot = counts.iterator.map(_.getLong(1)).sum
    val v = counts.length.toLong
    val sorted = counts.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    new graft.functions.BigramModel(
      sorted.map(_._1),
      sorted.map { case (_, c) =>
        StrictMath.log((c + 1.0) / (tot + v).toDouble)
      },
      StrictMath.log(1.0 / (tot + v).toDouble))
  }

  /** Score `df` against the artifact model — same output contract as
    * [[TextFeatures.charBigramEntropy]]: (doc_id, n_bigrams,
    * cross_entropy), one fused map-only kernel pass. */
  def score(df: DataFrame, id: Column, text: Column,
            m: graft.functions.BigramModel): DataFrame =
    df.select(id.as("doc_id"), normed(text).as("_t"))
      .filter(length(col("_t")) >= 2)
      .select(col("doc_id"), graft.functions.BigramCounts(col("_t")).as("_a"))
      .select(col("doc_id"),
        graft.functions.BigramScore(col("_a"), m).as("_s"))
      .select(col("doc_id"), col("_s.n").as("n_bigrams"),
        graft.functions.Numeric.cround(
          -col("_s.lp") / col("_s.n"), 6).as("cross_entropy"))
}
