package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental NEAR-dup dedup against a persisted signature index —
  * the near-duplicate sibling of [[IncrementalDedup]] (which answers
  * "does the snapshot already have these EXACT texts"): a
  * continuously-crawled corpus builds its MinHash band index ONCE,
  * persists it, and every new batch probes the index — no re-scan of
  * the corpus, ever (at 100 TB the corpus re-shingle IS the cost).
  *
  * Scale shape: the index is (band, bh, doc_id, sig) — one row per
  * (doc, band), 8-byte bucket keys plus the k-long signature; the
  * batch probe is an EQUI-join on (band, bh), so only bucket
  * collisions shuffle, and similarity is the signature estimate
  * (matching coordinates / k — the [[graft.streaming.MinHashStream]]
  * estimator), computed without touching corpus text. Persistence is
  * directory-partitioned BY BAND (the IndexStore layout rule): a
  * probe reads all bands, but band partitioning keeps rewrite units
  * (index refreshes append per band) and parallelism aligned.
  *
  * The estimate-vs-exact divergence is declared exactly as the
  * streaming member declares it: candidates can't false-negative at
  * the banding grain (a pair sharing a bucket IS probed), and the
  * estimator is unbiased; a caller needing exact Jaccard joins the
  * surviving (sliver-sized) pair set back to text — the batch
  * [[MinHashLSH.nearDupPairs]] verify.
  */
object IncrementalMinHash {

  /** Build the band index from the corpus: one map-only signature
    * pass, one explode to band grain. */
  def buildIndex(corpus: DataFrame, id: Column, text: Column,
                 shingleK: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    MinHashLSH.signatures(corpus, id, text, shingleK, k)
      .select(col("doc_id").as("corpus_id"), col("sig"),
        posexplode(graft.functions.BandHashes(col("sig"), bands)).as(Seq("band", "bh")))
      .select("band", "bh", "corpus_id", "sig")
  }

  /** Persist the index partitioned by band, WITH its build parameters:
    * the stored index is the cross-job handoff point, so it must be
    * self-describing — a probe with mismatched (shingleK, k, bands)
    * would silently miss every dup (different band keys; null padded
    * signature compares). [[probeStored]] reads the parameters back
    * and cannot mismatch. */
  def saveIndex(index: DataFrame, dir: String,
                shingleK: Int, k: Int, bands: Int): Unit = {
    index.write.mode(SaveMode.Overwrite).partitionBy("band").parquet(s"$dir/index")
    val spark = index.sparkSession
    import spark.implicits._
    Seq((shingleK, k, bands)).toDF("shingle_k", "k", "bands")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
  }

  /** Load a persisted index with its build parameters:
    * (index, shingleK, k, bands). */
  def loadIndex(spark: SparkSession, dir: String): (DataFrame, Int, Int, Int) = {
    val metaRows = spark.read.parquet(s"$dir/meta").collect()
    require(metaRows.length == 1,
      s"index meta at $dir/meta has ${metaRows.length} rows, expected 1 — " +
        "the index directory was appended across saveIndex runs; rebuild it")
    val meta = metaRows(0)
    (spark.read.parquet(s"$dir/index"),
      meta.getAs[Int]("shingle_k"), meta.getAs[Int]("k"), meta.getAs[Int]("bands"))
  }

  /** Probe a PERSISTED index: the batch is signed with the index's own
    * stored parameters, so a parameter mismatch cannot happen. */
  def probeStored(spark: SparkSession, dir: String, batch: DataFrame,
                  bId: Column, bText: Column): DataFrame = {
    val (index, shingleK, k, bands) = loadIndex(spark, dir)
    probe(index, batch, bId, bText, shingleK, k, bands)
  }

  /** Probe the index with a batch: every (batch doc, corpus doc) pair
    * sharing at least one band bucket, with the signature-estimated
    * Jaccard. One signature pass over the batch, one equi-join on the
    * 8-byte bucket key. The match count is computed per JOIN row, so
    * only an 8-byte count (not the two k-long signatures) crosses the
    * pair-grain exchange. A width check over EVERY index row (min and
    * max signature size in one aggregate) fails fast when the index
    * holds ANY row built at a different k than the probe: a mismatch
    * makes that row's bucket keys incomparable, so the join would
    * quietly skip it and its near-dups would sail through as new (the
    * silent failure [[probeStored]] exists to prevent). A
    * heterogeneous index — parquet appended across saveIndex runs
    * with different parameters — is caught here even when its first
    * row happens to match. The guard is LAZY — a one-row aggregate
    * broadcast onto the BATCH side of the plan and asserted there, so
    * it costs nothing until the probe actually executes, rides the
    * same action when it does (no separate synchronous job per
    * probe() call), and fires whenever any batch row exists —
    * independent of join cardinality, because an empty bucket join is
    * exactly the silent miss the guard must not trust. An EMPTY index
    * is vacuously consistent: no indexed corpus row means no possible
    * near-dup, and the probe correctly reports every batch row as
    * unmatched. */
  def probe(index: DataFrame, batch: DataFrame, bId: Column, bText: Column,
            shingleK: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val widths = index.agg(min(size(col("sig"))).as("_glo"),
      max(size(col("sig"))).as("_ghi"))
    val probes = MinHashLSH.signatures(batch, bId, bText, shingleK, k)
      .select(col("doc_id").as("batch_id"), col("sig").as("_bsig"),
        posexplode(graft.functions.BandHashes(col("sig"), bands)).as(Seq("band", "bh")))
      .crossJoin(broadcast(widths))
      .where(assert_true(
        col("_glo").isNull || (col("_glo") === k && col("_ghi") === k),
        concat(lit("index signature widths span ["), col("_glo"),
          lit(", "), col("_ghi"),
          lit(s"], probe expects k=$k — the index was built with " +
            "different parameters (or appended across runs); use " +
            "probeStored"))).isNull)
      .drop("_glo", "_ghi")
    probes.join(index, Seq("band", "bh"))
      .withColumn("_m", aggregate(zip_with(col("_bsig"), col("sig"),
          (a, b) => (a === b).cast("long")),
        lit(0L), (acc, m) => acc + m))
      .groupBy(col("batch_id"), col("corpus_id"))
      .agg(max(col("_m")).as("_m"))
      .withColumn("est_jaccard",
        graft.functions.Numeric.cround(col("_m").cast("double") / k, 6))
      .select("batch_id", "corpus_id", "est_jaccard")
  }

  /** The full incremental answer: every batch row with its best
    * near-dup in the corpus at `threshold` (`dup_of`, smallest
    * corpus id among the highest-estimate candidates — deterministic)
    * and an `is_new` flag. Batch-internal near-dups are NOT collapsed
    * here (that is the in-batch pair generator's job); this answers
    * "which of these rows does the INDEXED corpus already have". */
  def dedupAgainst(index: DataFrame, batch: DataFrame, bId: Column,
                   bText: Column, threshold: Double,
                   shingleK: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    val cand = probe(index, batch, bId, bText, shingleK, k, bands)
      .filter(col("est_jaccard") >= threshold)
      .groupBy(col("batch_id"))
      .agg(min_by(col("corpus_id"),
        struct((-col("est_jaccard")).as("s"), col("corpus_id"))).as("dup_of"))
    batch.select(bId.as("batch_id"))
      .join(cand, Seq("batch_id"), "left")
      .select(col("batch_id").as("doc_id"), col("dup_of"),
        col("dup_of").isNull.cast("int").as("is_new"))
  }
}
