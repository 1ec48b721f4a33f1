package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One content-defined chunk of one asset. */
case class CdcChunk(doc_id: Long, chunk_idx: Int, offset: Int, len: Int,
                    chunk_hash: Long)

/** Content-defined chunking (the Gear-hash/FastCDC family, public
  * algorithm): boundaries are declared where a rolling hash of the
  * byte window hits a mask, so they are a function of CONTENT, not
  * position — insert one byte near the start of a 10 MB payload and
  * fixed-size chunking re-hashes every block after it, while CDC
  * boundaries resynchronize within one chunk and every later chunk
  * hash is UNCHANGED (spec-pinned: the property that makes chunk-level
  * dedup work on shifted/embedded content — partially-overlapping
  * binaries, re-muxed media, documents with prepended headers, the
  * cases whole-asset hashing provably misses).
  *
  * Determinism: the 256-entry gear table derives from the public
  * splitmix64 finalizer ([[graft.functions.Mix64]]), chunk hashes are
  * FNV-1a over the chunk bytes — no RNG state anywhere, identical on
  * every run/partitioning. Scale shape mirrors the multimodal decode
  * passes: one batched `mapPartitions`, each payload crosses the wire
  * once and fans out to its chunks in-executor; downstream chunk-level
  * dedup shuffles 8-byte chunk hashes, never bytes. */
object Cdc {

  private val gear: Array[Long] =
    Array.tabulate(256)(i => graft.functions.Mix64.compute(0x9E3779B9L + i))

  /** Boundary positions + FNV-1a hashes. `avgBits` sets the expected
    * chunk size (2^avgBits); boundaries are suppressed below `minSize`
    * and forced at `maxSize`. */
  private[graft] def chunkOne(bytes: Array[Byte], minSize: Int,
                              avgBits: Int, maxSize: Int): Seq[(Int, Int, Long)] = {
    val mask = (1L << avgBits) - 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var start = 0
    var h = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      i += 1
      val len = i - start
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize || i == n) {
        out += ((start, len, fnv1a(bytes, start, len)))
        start = i
        h = 0L
      }
    }
    out.toSeq
  }

  private[graft] def fnv1a(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = 1469598103934665603L
    var i = off
    while (i < off + len) {
      h = (h ^ (bytes(i) & 0xff)) * 1099511628211L
      i += 1
    }
    h
  }

  /** Chunk every asset: (doc_id, chunk_idx, offset, len, chunk_hash).
    * Empty payloads emit nothing. */
  def chunks(spark: SparkSession, df: DataFrame,
             minSize: Int = 16, avgBits: Int = 6, maxSize: Int = 256,
             batchSize: Int = 64): Dataset[CdcChunk] = {
    import spark.implicits._
    require(minSize >= 1 && maxSize >= minSize && avgBits >= 1)
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            chunkOne(bytes, minSize, avgBits, maxSize).iterator.zipWithIndex
              .map { case ((off, len, h), ci) => CdcChunk(id, ci, off, len, h) }
          }
        }
      }
  }

  /** Cross-asset shared-chunk report: chunks (by content hash) present
    * in more than one document, with their spread — the chunk-level
    * dup evidence whole-asset dedup misses. Shuffles 8-byte hashes. */
  def sharedChunks(chunks: Dataset[CdcChunk], minDocs: Long = 2L): DataFrame =
    chunks.toDF()
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        max(col("len")).as("chunk_len"))
      .filter(col("n_docs") >= minDocs)
}
