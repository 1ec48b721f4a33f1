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
    * members older than the retention horizon pruned before pairing.
    * LATE (watermark-admitted) arrivals make neither the batch nor the
    * stored timestamps monotonic, so pruning FILTERS the whole member
    * list against the arrival's cutoff (not a head-pop) and inserts
    * keep event-time order by re-sorting — member counts are cap-bounded,
    * so the per-arrival O(cap) walk is the declared constant. */
  private[streaming] def fold(s0: BucketState, cap: Int, k: Int,
                              retentionMs: Long,
                              rows: Seq[BandAt]): (BucketState, List[NearDupCand]) = {
    // (ts, id, sig) members in event-time order
    var members: List[(Long, Long, Array[Long])] =
      s0.tss.lazyZip(s0.ids).lazyZip(s0.sigs).toList
    val out = List.newBuilder[NearDupCand]
    rows.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
      val cutoff = r.ts.getTime - retentionMs
      members = members.filter(_._1 >= cutoff)
      if (!members.exists(_._2 == r.doc_id)) {
        val targets = if (members.size < cap) members
                      else members.headOption.toList // oldest live member
        targets.foreach { case (_, id, sig) =>
          val est = estJaccard(sig, r.sig, k)
          out += NearDupCand(math.min(id, r.doc_id), math.max(id, r.doc_id),
            graft.functions.Numeric.croundD(est, 6))
        }
        if (members.size < cap) {
          members = ((r.ts.getTime, r.doc_id, r.sig) :: members)
            .sortBy(m => (m._1, m._2))
        }
      }
    }
    (BucketState(members.map(_._2), members.map(_._3), members.map(_._1)),
      out.result())
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
            // GC horizon from the LIVE members (a late batch must not
            // shrink an earlier member's horizon): max member ts, not
            // this batch's max
            val maxTs =
              if (next.tss.nonEmpty) next.tss.max
              else batch.iterator.map(_.ts.getTime).max
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

  /** Probe a STATIC corpus band index (the
    * [[graft.dedup.IncrementalMinHash]] artifact) from a stream — the
    * live-crawl front of INCREMENTAL near-dup dedup: every arriving
    * doc is checked against yesterday's indexed corpus. Entirely
    * STATELESS — signatures and band hashes are map-side kernels and
    * the lookup is a stream-static equi-join on the 8-byte bucket key
    * (Spark broadcasts or shuffle-joins the static side per
    * micro-batch; no streaming state at all, so there is no horizon,
    * no cap, and exactly the batch probe's semantics). Batch/stream
    * parity is structural: same kernels, same join, same estimate —
    * the spec pins result equality per micro-batch. Emits every
    * candidate at estimate >= threshold; combine with
    * [[nearDupCandidates]] when the stream must also be deduped
    * against its own recent past. */
  def probeIndexStream(docs: Dataset[SigAt], index: DataFrame,
                       shingleK: Int = 3, k: Int = 64, bands: Int = 16,
                       threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val probes = docs.toDF()
      .withColumn("sig", graft.functions.MinHashSignature(col("text"), shingleK, k))
      .filter(col("sig").isNotNull)
      .select(col("ts"), col("doc_id").as("batch_id"), col("sig").as("_bsig"),
        posexplode(graft.functions.BandHashes(col("sig"), bands)).as(Seq("band", "bh")))
    probes.join(index, Seq("band", "bh"))
      .withColumn("est_jaccard", graft.functions.Numeric.cround(
        aggregate(zip_with(col("_bsig"), col("sig"),
            (a, b) => (a === b).cast("long")),
          lit(0L), (acc, m) => acc + m).cast("double") / k, 6))
      .filter(col("est_jaccard") >= threshold)
      // a pair sharing several buckets emits once per shared bucket —
      // deduping here would need streaming state (contradicting the
      // stateless design); every duplicate carries the identical
      // estimate and the batch finalize collapses them, the
      // stream-proposes/batch-finalizes grain every streaming member
      // uses
      .select(col("batch_id"), col("corpus_id"), col("est_jaccard"))
  }
}
