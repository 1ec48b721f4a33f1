package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One timestamped document id for windowed sampling. */
case class IdAt(ts: Timestamp, id: Long)

/** A sample candidate of one closed window (per-shard top-k member). */
case class WindowCand(window_start: Long, id: Long, skey: Long)

/** Bounded per-(window, shard) state: the shard's current k smallest
  * (Lehmer key, id) pairs, sorted ascending. */
case class TopKState(keys: List[Long], ids: List[Long])

/** Streaming per-window exact-k deterministic sampling — the streaming
  * surface of [[graft.text.SampleK]] (SURVEY §2.3 row 30i): a fixed-size
  * uniform draw per event-time window over an unbounded stream (the
  * rolling eval-split / human-review sample a live corpus feed needs).
  * Determinism carries over exactly: a row's priority is the same
  * (Lehmer(id), id) key every graft sampler uses, so the drawn set is
  * a pure function of the window's membership — re-runs, replays and
  * re-partitionings cannot change it.
  *
  * Shape mirrors [[HeavyHitterStream]] — stream PROPOSES, batch
  * FINALIZES, and the composition is EXACT (not approximate, unlike
  * the heavy-hitter counters): state keyed by (window, shard-of-id)
  * holds only that shard's k smallest keys (bounded at k pairs per
  * key; sharding keeps a hot window from serialising on one state
  * key), watermark-closed emission via event-time timeout yields each
  * shard's candidates exactly once, and [[finalizeK]] picks the global
  * k smallest from the k·shards candidates — correct because the
  * window's true top-k is contained in the union of shard top-ks (any
  * global member is a member of its own shard's top-k). */
object SampleStream {

  private val M = 2147483647L

  private[streaming] def priority(id: Long): Long = (id % M) * 48271L % M

  /** Fold rows into a bounded sorted top-k list. Re-deliveries of an
    * id already held are dropped (ids are expected unique per window —
    * document ids — but an at-least-once source replaying a row must
    * not let one id occupy two sample slots). */
  private[streaming] def fold(s: TopKState, k: Int,
                              rows: Iterator[Long]): TopKState = {
    var entries = s.keys.zip(s.ids)
    rows.foreach { id =>
      val e = (priority(id), id)
      if (!entries.contains(e) &&
          (entries.size < k || implicitly[Ordering[(Long, Long)]].lt(e, entries.last))) {
        entries = ((e :: entries).sorted).take(k)
      }
    }
    TopKState(entries.map(_._1), entries.map(_._2))
  }

  def windowedSampleK(events: Dataset[IdAt], windowSec: Long, k: Int,
                      shards: Int = 8,
                      watermarkDelay: String = "10 seconds"): Dataset[WindowCand] = {
    require(windowSec > 0 && k > 0 && shards > 0)
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey { r =>
        val w = math.floorDiv(r.ts.getTime / 1000L, windowSec) * windowSec
        (w, math.floorMod(java.lang.Long.hashCode(r.id), shards))
      }
      .flatMapGroupsWithState[TopKState, WindowCand](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Int), rows: Iterator[IdAt], state: GroupState[TopKState]) =>
          val (windowStart, _) = key
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s.keys.zip(s.ids).iterator.map { case (sk, id) =>
              WindowCand(windowStart, id, sk)
            }
          } else {
            val prev = state.getOption.getOrElse(TopKState(Nil, Nil))
            state.update(fold(prev, k, rows.map(_.id)))
            state.setTimeoutTimestamp(math.max(
              (windowStart + windowSec) * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** Batch finalize: the global k smallest (skey, id) per window from
    * the streamed candidates — EXACT for the stream's admitted rows
    * (the true top-k is inside the shard-top-k union; late-beyond-
    * watermark rows were dropped before sketching, the same caveat
    * every watermark-bounded aggregation carries). The candidate set
    * is k·shards rows per window, so the window sort is driver-cheap
    * at any corpus rate. */
  def finalizeK(candidates: DataFrame, k: Int): DataFrame =
    candidates
      .withColumn("_rn", row_number().over(
        Window.partitionBy("window_start").orderBy(col("skey"), col("id"))))
      .filter(col("_rn") <= k)
      .select(col("window_start"), col("id"))
}
