package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release manifest — the integrity receipt a corpus export ships per
  * shard: row count, token mass, and an ORDER-INDEPENDENT content
  * checksum (bit_xor of per-document fingerprints — commutative and
  * associative, so the checksum is a pure function of shard MEMBERSHIP
  * and any re-partitioned / re-ordered rebuild or transfer verifies
  * against it without sorting anything). The consumer-side check is
  * the same aggregate over the received files; a corrupted, missing or
  * duplicated document flips the xor except on 2^-w-probability hash
  * coincidences.
  *
  * One map-side-combined aggregate over the export — |shards| output
  * rows; composes with any layout ([[Shuffle]], [[Sharding]]). */
object Manifest {

  /** (shard, n_docs, n_tokens, checksum). `fingerprint` must be a
    * deterministic per-document long (the engine's PolyFingerprint for
    * cross-engine-replayable checksums, or xxhash64 when replay is not
    * needed). bit_xor is Spark's native aggregate (no Scala wrapper —
    * routed through expr on a projected column). */
  def shardManifest(df: DataFrame, shard: Column, nTokens: Column,
                    fingerprint: Column): DataFrame =
    df.select(shard.as("shard"), nTokens.cast("long").as("_tok"),
        fingerprint.as("_fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("n_tokens"),
        expr("bit_xor(_fp)").as("checksum"))
}
