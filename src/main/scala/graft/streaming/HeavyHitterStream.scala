package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One timestamped item arrival for windowed heavy-hitter detection. */
case class ItemAt(ts: Timestamp, item: String)

/** A candidate heavy hitter of one closed window: `cnt` is the
  * Misra-Gries counter value — a LOWER bound on the true count, within
  * n_shard/(k+1) of it. */
case class WindowHH(window_start: Long, item: String, cnt: Long)

/** Per-(window, shard) sketch state: MG counters plus the processed
  * row count (for threshold math downstream). */
case class HHState(counters: Map[String, Long], n: Long)

/** Streaming per-window heavy hitters — the streaming surface of
  * [[graft.operators.HeavyHitters]] (SURVEY §2.3 row 30e): dominant
  * tokens/domains/templates per event-time window over an unbounded
  * stream, the corpus-build monitor that batch frequent-items cannot
  * serve (the window never "finishes" in batch).
  *
  * Shape: state is keyed by (window, shard-of-item) and holds ONE
  * Misra-Gries sketch of `k` counters — constant memory per key
  * regardless of vocabulary. Sharding by item hash keeps a hot window
  * from serialising on one state key at 100 TB/day rates: every
  * occurrence of an item lands in the SAME shard, and the classical
  * guarantee is preserved per shard (an item with global count
  * > n_shard/(k+1) — implied by > n/(k+1) since n_shard <= n —
  * survives its shard's sketch). Candidates therefore form a SUPERSET
  * of every true heavy hitter at any f > 1/(k+1) threshold; the
  * emitted counter values are lower bounds within n_shard/(k+1).
  *
  * Emission is watermark-closed via EVENT-TIME timeout: when the
  * watermark passes a window's end, its state times out, emits its
  * candidates once, and is removed — bounded state, exactly-once
  * per-window output. Rows later than the watermark delay are DROPPED
  * before reaching the state function (Spark filters
  * flatMapGroupsWithState input behind the watermark when event-time
  * timeout is used — spec-pinned), so a closed window never reopens;
  * the timeout-timestamp clamp below is defensive only. (The exact counting
  * pass the batch operator runs over its candidates is a re-scan,
  * which a stream cannot do — the deliberate approximation gap, stated
  * here; downstream joins the candidate set against stored counts when
  * exactness matters.)
  *
  * Input must carry a watermark on `ts` (the operator asserts this by
  * requiring event-time timeout to be legal). Contract mirrors the
  * other stateful operators: parallelism across (window, shard) keys.
  */
object HeavyHitterStream {

  /** Misra-Gries fold of one batch of items into the counter map —
    * the same reduce rule as the batch Aggregator. */
  private[streaming] def mgFold(counters0: Map[String, Long], k: Int,
                                items: Iterator[String]): (Map[String, Long], Long) = {
    var counters = counters0
    var n = 0L
    items.foreach { item =>
      n += 1
      if (counters.contains(item)) counters = counters.updated(item, counters(item) + 1L)
      else if (counters.size < k) counters = counters.updated(item, 1L)
      else counters = counters.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }
    (counters, n)
  }

  /** The batch verification pass the stream's doc declares: exact
    * per-window counts for the STREAMED candidates, from the stored
    * events — the production pattern (the stream proposes with
    * lower-bound counters; a batch pass over the archived window
    * verifies and thresholds exactly). Only candidate (window, item)
    * pairs are counted — the candidate set bounds the shuffle exactly
    * as in the batch operator's stage 2 — and `minFrac = num/den`
    * applies against the window's true row count. Output:
    * (window_start, item, cnt) — the exact >= threshold set over the
    * rows the STREAM PROCESSED: the per-shard Misra-Gries guarantee
    * makes candidates a superset of every heavy hitter among sketched
    * rows, but a row later than the watermark delay was dropped before
    * sketching, so an item heavy ONLY in the archive's late tail can
    * be absent from the candidates (and hence from this output) even
    * if `events` includes it. Archive with the same watermark
    * discipline — or treat the result as exact w.r.t. the stream's
    * admitted rows — the same caveat every watermark-bounded
    * aggregation carries. */
  def exactify(candidates: DataFrame, events: Dataset[ItemAt],
               windowSec: Long, num: Long, den: Long): DataFrame = {
    require(windowSec > 0 && num > 0 && den > 0)
    val rows = events.toDF()
      .select((floor(col("ts").cast("long") / windowSec) * windowSec)
        .as("window_start"), col("item"))
    val totals = rows.groupBy("window_start")
      .agg(count(lit(1)).as("_total"))
    val cand = candidates.select(col("window_start"), col("item")).distinct()
    rows.join(cand, Seq("window_start", "item"), "left_semi")
      .groupBy("window_start", "item")
      .agg(count(lit(1)).as("cnt"))
      .join(totals, Seq("window_start"))
      .filter(col("cnt") * den >= col("_total") * num)
      .select(col("window_start"), col("item"), col("cnt"))
  }

  def windowedFrequentItems(items: Dataset[ItemAt], windowSec: Long, k: Int,
                            shards: Int = 8,
                            watermarkDelay: String = "10 seconds"): Dataset[WindowHH] = {
    require(windowSec > 0 && k > 0 && shards > 0)
    import items.sparkSession.implicits._
    items
      .withWatermark("ts", watermarkDelay)
      .groupByKey { r =>
        val w = math.floorDiv(r.ts.getTime / 1000L, windowSec) * windowSec
        (w, math.floorMod(r.item.hashCode, shards))
      }
      .flatMapGroupsWithState[HHState, WindowHH](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Int), rows: Iterator[ItemAt], state: GroupState[HHState]) =>
          val (windowStart, _) = key
          if (state.hasTimedOut) {
            // watermark passed the window end: emit candidates, close
            val s = state.get
            state.remove()
            s.counters.iterator.map { case (item, cnt) =>
              WindowHH(windowStart, item, cnt)
            }
          } else {
            val prev = state.getOption.getOrElse(HHState(Map.empty, 0L))
            val (counters, dn) = mgFold(prev.counters, k, rows.map(_.item))
            state.update(HHState(counters, prev.n + dn))
            // close when the watermark passes the window's end. With
            // event-time timeout Spark filters input behind the
            // watermark before this function (spec-pinned above), so
            // window_end > watermark always holds here; the clamp is
            // defensive only (a timeout at or below the watermark
            // would throw).
            state.setTimeoutTimestamp(math.max(
              (windowStart + windowSec) * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
