package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._

/** Incremental (snapshot-vs-batch) exact dedup — the shape a growing
  * corpus actually runs: yesterday's 100 TB corpus is already deduped,
  * today's crawl batch must be checked AGAINST it without re-shuffling
  * the snapshot (re-running whole-corpus dedup per increment is
  * quadratic over the corpus lifetime).
  *
  * Reference analogy: the pipeline's per-video incremental layout
  * (`main.nf` processes each new timelapse against existing outputs);
  * the operator itself is the standard incremental-dedup member of the
  * training-data mandate (this engine's §2.3 surface).
  *
  * Plan shape (the 100 TB story):
  *  1. The snapshot's fingerprint INDEX — one row per distinct
  *     `xxhash64(text)` with the canonical (min) corpus id — is built
  *     with ONE corpus shuffle and is the persistent artifact an
  *     incremental pipeline stores (bucketed by hash, it never
  *     shuffles again; here it is computed on the fly and persisted).
  *  2. ONE distributed pass over the index builds a Bloom filter of
  *     every corpus hash (partial filters merged treeAggregate-style
  *     by Spark's sketch machinery). The filter is a driver/broadcast
  *     artifact: ~1.2 MB per million keys at 1% fpp. At trillion-key
  *     scale, shard the filter by hash prefix and probe the matching
  *     shard — the probe below is unchanged per shard.
  *  3. Every batch row probes the filter MAP-SIDE via the codegen'd
  *     native `might_contain` expression (no UDF, no shuffle, no join
  *     participation for the overwhelmingly-common certainly-new row).
  *  4. Only bloom-POSITIVE rows (true dups + the fpp sliver of false
  *     positives) enter the verify join against the index — keyed on
  *     the hash the index is already partitioned by, so the join
  *     reuses the index's partitioning and shuffles only the tiny
  *     candidate set.
  *
  * The result is EXACT regardless of fpp: Bloom filters have no false
  * negatives (a missed duplicate is impossible) and every false
  * positive dies in the verify join. `IncrementalDedupSpec` pins this
  * by forcing a pathologically under-sized filter and checking parity
  * with the plain join.
  */
object IncrementalDedup {

  /** Snapshot fingerprint index: (h = xxhash64(text), corpus_id = min
    * id with that text). One shuffle; 16 bytes a row no matter how
    * wide the documents are. Collision note: distinct texts sharing a
    * 64-bit hash (~n²/2^64) would alias — the same declared trade as
    * `Dedup.exactByHash`; index on two independent hashes if the
    * corpus outgrows it. */
  def index(corpus: DataFrame, id: Column, text: Column): DataFrame =
    corpus.groupBy(xxhash64(text).as("h")).agg(min(id).as("corpus_id"))

  /** Codegen'd Bloom-membership probe column over a serialized filter
    * (native Catalyst `might_contain`; the filter rides the plan as a
    * binary literal → broadcast with the task closure). */
  def mightContain(filterBytes: Array[Byte], h: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(filterBytes), GraftBridge.expression(h)))

  /** Build the serialized corpus filter from an index in one
    * distributed pass. `expectedItems` sizes the bits; pass the index
    * count (or a cheap overestimate — oversizing only wastes bits). */
  def buildFilter(idx: DataFrame, expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = idx.stat.bloomFilter("h", math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Dedup `batch` against `corpus`: every batch row comes back with
    * its corpus canonical (`dup_of`, null when unseen) and an `is_new`
    * flag. Batch-internal duplicates are NOT collapsed here — that is
    * the plain in-batch `Dedup.exact` pass; this operator answers
    * "which of these rows does the snapshot already have". */
  def dedupAgainst(corpus: DataFrame, cId: Column, cText: Column,
                   batch: DataFrame, bId: Column, bText: Column,
                   fpp: Double = 0.01,
                   filterItemsOverride: Option[Long] = None): DataFrame = {
    val idx = index(corpus, cId, cText)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = idx.count() // materializes the persisted index; also sizes the filter
    val bytes = buildFilter(idx, filterItemsOverride.getOrElse(n), fpp)
    val probed = batch.select(bId.as("doc_id"), xxhash64(bText).as("h"))
      .withColumn("_maybe", mightContain(bytes, col("h")))
    // bloom-negative rows are new BY PROOF (no false negatives): they
    // never touch the join. Positives verify against the index.
    val fresh = probed.filter(!col("_maybe"))
      .select(col("doc_id"), lit(null).cast("long").as("dup_of"))
    val checked = probed.filter(col("_maybe"))
      .join(idx, Seq("h"), "left")
      .select(col("doc_id"), col("corpus_id").as("dup_of"))
    // the verify join is idx's last reader: release the cache once the
    // caller materializes the result (best-effort — see CacheRelease)
    graft.functions.CacheRelease.afterNextExecution(idx)
    fresh.unionByName(checked)
      .withColumn("is_new", col("dup_of").isNull.cast("int"))
  }
}
