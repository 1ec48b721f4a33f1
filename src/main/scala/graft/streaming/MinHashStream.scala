package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One timestamped document for streaming near-dup detection. */
case class SigAt(ts: Timestamp, doc_id: Long, text: String)

/** One banded arrival: the doc's signature routed to one LSH bucket. */
case class BandAt(ts: Timestamp, doc_id: Long, band: Int, bh: Long,
                  sig: Array[Long])

/** A streamed near-dup candidate pair (d1 < d2): `est_jaccard` is the
  * signature estimate (matching MinHash coordinates / k), an unbiased
  * estimator of true Jaccard — NOT the exact verify the batch
  * operator runs (a stream cannot re-shingle an already-passed doc). */
case class NearDupCand(d1: Long, d2: Long, est_jaccard: Double)

/** Per-bucket state: members seen within the retention horizon, in
  * arrival (= event-time) order, bounded at `cap` entries. Member
  * timestamps make the horizon exact at ACCESS time — the event-time
  * timeout only garbage-collects quiet buckets lazily, so an arrival
  * into a not-yet-collected bucket must prune expired members itself. */
case class BucketState(ids: List[Long], sigs: List[Array[Long]],
                       tss: List[Long])

/** STREAMING MinHash-LSH near-duplicate detection — the streaming
  * surface of [[graft.dedup.MinHashLSH]] (SURVEY §2.3 row 24): an
  * unbounded document feed deduplicated against its own recent past
  * (the live-crawl front of a dedup pipeline, where "recent" is the
  * watermark-retention horizon — the streaming twin of the
  * exact-hash `dropDuplicatesWithinWatermark` stage, for NEAR dups).
  *
  * Shape — stream PROPOSES, batch FINALIZES (the HeavyHitterStream /
  * SampleStream pattern): signatures and band hashes are the SAME
  * codegen kernels the batch operator uses (map-side, no state), and
  * state lives per (band, bucket-hash) key holding that bucket's
  * members within the horizon — ids + signatures, bounded at `cap`
  * entries (k longs each: a declared, constant per-key bound). An
  * arriving doc emits one candidate pair per stored member of each of
  * its buckets, with the signature-estimated Jaccard; a pair sharing
  * several buckets is emitted once per shared bucket, and the batch
  * [[finalizePairs]] collapses duplicates — exactly the banding
  * semantics of the batch candidate generator.
  *
  * A FULL bucket mirrors the batch operator's star-cap: overflow
  * arrivals pair against the bucket's FIRST member only (cluster
  * connectivity preserved at 1 edge instead of cap) and are not
  * stored. The retention horizon is EXACT: members older than
  * `retentionSec` before an arrival are pruned at access time (the
  * event-time timeout only garbage-collects quiet buckets, lazily),
  * so a dup arriving beyond the horizon is a miss BY CONTRACT — the
  * same bounded-memory declaration every watermark-bounded dedup
  * carries; the batch operator over the archive is the
  * unbounded-horizon complement.
  */
object MinHashStream {

  /** Deterministic in-batch fold: rows sorted by (ts, doc_id), replay
    * of an id already stored is dropped (at-least-once sources),
    * members older than the retention horizon pruned before pairing
    * (state is in event-time order, so pruning pops from the head). */
  private[streaming] def fold(s0: BucketState, cap: Int, k: Int,
                              retentionMs: Long,
                              rows: Seq[BandAt]): (BucketState, List[NearDupCand]) = {
    var ids = s0.ids
    var sigs = s0.sigs
    var tss = s0.tss
    val out = List.newBuilder[NearDupCand]
    rows.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
      val cutoff = r.ts.getTime - retentionMs
      while (tss.nonEmpty && tss.head < cutoff) {
        ids = ids.tail; sigs = sigs.tail; tss = tss.tail
      }
      if (!ids.contains(r.doc_id)) {
        val targets = if (ids.size < cap) ids.zip(sigs)
                      else ids.headOption.map(h => (h, sigs.head)).toList
        targets.foreach { case (id, sig) =>
          val est = estJaccard(sig, r.sig, k)
          out += NearDupCand(math.min(id, r.doc_id), math.max(id, r.doc_id),
            graft.functions.Numeric.croundD(est, 6))
        }
        if (ids.size < cap) {
          ids = ids :+ r.doc_id; sigs = sigs :+ r.sig; tss = tss :+ r.ts.getTime
        }
      }
    }
    (BucketState(ids, sigs, tss), out.result())
  }

  /** Fraction of matching MinHash coordinates — the standard unbiased
    * Jaccard estimator. */
  private[graft] def estJaccard(a: Array[Long], b: Array[Long], k: Int): Double = {
    var m = 0
    var i = 0
    while (i < k) { if (a(i) == b(i)) m += 1; i += 1 }
    m.toDouble / k
  }

  /** Candidate near-dup pairs over the stream. `docs` must carry event
    * time in `ts`; output is append-mode candidates. */
  def nearDupCandidates(docs: Dataset[SigAt], shingleK: Int = 3, k: Int = 64,
                        bands: Int = 16, cap: Int = 64,
                        retentionSec: Long = 3600,
                        watermarkDelay: String = "10 seconds"): Dataset[NearDupCand] = {
    require(k % bands == 0, "bands must divide k")
    require(cap >= 1 && retentionSec > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .withColumn("sig", graft.functions.MinHashSignature(col("text"), shingleK, k))
      .filter(col("sig").isNotNull)
      .select(col("ts"), col("doc_id"),
        posexplode(graft.functions.BandHashes(col("sig"), bands)).as(Seq("band", "bh")),
        col("sig"))
      .as[BandAt]
    banded
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState[BucketState, NearDupCand](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandAt], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(BucketState(Nil, Nil, Nil))
            val (next, cands) = fold(prev, cap, k, retentionSec * 1000L, batch)
            state.update(next)
            val maxTs = batch.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(math.max(
              maxTs + retentionSec * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            cands.iterator
          }
      }
  }

  /** The batch finalize: collapse per-bucket duplicate emissions to
    * one row per pair (the estimates agree across buckets — same two
    * signatures — so max is a formality) and apply the threshold. */
  def finalizePairs(cands: DataFrame, threshold: Double): DataFrame =
    cands.groupBy(col("d1"), col("d2"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
}
