package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Numeric._

/** Row of a streaming event for stateful sessionization. */
case class SessionEvent(user_id: Long, ts_s: Long)

/** Timestamped variant — carries the event-time column so a watermark
  * can drive session closing. */
case class SessionEventT(user_id: Long, ts: java.sql.Timestamp)

/** Row of a streaming positioned observation for movement features. */
case class MoveEvent(user_id: Long, event_id: Long, ts_s: Long, x: Double, y: Double)

/** Per-track movement state carried between micro-batches. */
case class MoveState(x0: Double, y0: Double, lastX: Double, lastY: Double,
                     lastTs: Long, trac: Double)

/** Incremental movement features for one observation. */
case class MoveOut(user_id: Long, event_id: Long, dis: Double, trac: Double,
                   d2t: Double, vel: Double)

/** Open-session state carried between micro-batches. */
case class SessionState(start_s: Long, last_s: Long, n: Long)

/** A closed session emitted once its gap elapses (or the group times out). */
case class SessionOut(user_id: Long, session_start_s: Long,
                      session_end_s: Long, n_events: Long)

/** Structured-streaming mirrors of the batch operators. The reference
  * processes timelapses frame-by-frame (an inherently incremental
  * model); here the same column pipeline serves both `read` and
  * `readStream` inputs — the batch run is the correctness oracle for
  * the streaming run.
  */
object StreamOps {

  /** Tumbling-window counts/sums per event_type. Works on batch and
    * (with the watermark) streaming inputs; in streaming mode state is
    * bounded by the watermark. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(events.withWatermark("ts", _)).getOrElse(events)
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("v_sum"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n"), col("v_sum"))
  }

  /** Tumbling-window DISTINCT counting per event_type via the
    * mergeable DataSketches HLL (the 7i2 sketch family's streaming
    * face): exact streaming distinct would hold every value id in
    * state, unbounded per window — the sketch keeps state at one
    * fixed-size buffer per (window, type) however many values arrive,
    * and its update/merge is exactly the operation micro-batch
    * incremental aggregation needs. Same function serves batch and
    * (with the watermark) streaming inputs; the batch run is the
    * oracle. */
  def windowedDistinct(events: DataFrame, windowLen: String = "1 hour",
                       watermark: Option[String] = None,
                       lgK: Int = 12): DataFrame = {
    val src = watermark.map(events.withWatermark("ts", _)).getOrElse(events)
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(lgK)))
        .as("approx_distinct"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("approx_distinct"))
  }

  /** Tumbling-window QUANTILES per event_type via the bottom-k sample
    * sketch (the quantile twin of [[windowedDistinct]], r12): exact
    * streaming percentiles would hold every value in state, unbounded
    * per window — the sketch keeps one <= k-entry buffer per (window,
    * type) and its merge is the semilattice union micro-batch
    * incremental aggregation needs, so arrival order across batches
    * cannot change the emitted estimate. Same function serves batch
    * and (with the watermark) streaming inputs; the batch run is the
    * oracle (StreamingSpec). */
  def windowedQuantile(events: DataFrame, windowLen: String = "1 hour",
                       watermark: Option[String] = None, k: Int = 64,
                       percents: Seq[Int] = Seq(50, 95)): DataFrame = {
    val src = watermark.map(events.withWatermark("ts", _)).getOrElse(events)
    val agged = src.filter(col("value").isNotNull)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.operators.QuantileSketch
          .sketchAgg(col("event_id"), col("value"), k).as("_sk"))
      .withColumn("_vs",
        array_sort(transform(col("_sk.entries"), _.getField("_2"))))
      .withColumn("m", size(col("_vs")))
    percents.foldLeft(agged) { (df, p) =>
      df.withColumn(s"p$p", element_at(col("_vs"),
        expr(s"CAST(((m - 1) * $p) DIV 100 AS INT) + 1")))
    }.select(Seq(unix_timestamp(col("window.start")).as("win_start_s"),
      col("event_type"), col("n"), col("m")) ++
      percents.map(p => col(s"p$p")): _*)
  }

  /** Stream-static enrichment: join a stream against a (broadcastable)
    * static dimension — the streaming form of the reference's
    * "attach config/metadata to every frame record" joins. Spark plans
    * the static side per micro-batch; with a small dimension it stays a
    * broadcast join, no stream-side shuffle. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), key)

  /** Streaming exact dedup: drop repeated keys within the watermark
    * horizon (`dropDuplicatesWithinWatermark` bounds state — the
    * streaming counterpart of `Dedup.exact`; at 100 TB/day the
    * watermark IS the dedup memory budget). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Event-time sessionization: sessions close when the WATERMARK
    * passes session end + gap — driven by data progress, not
    * wall-clock (the processing-time variant below closes sessions on
    * executor idleness, which at 100 TB replay speed is meaningless).
    * State per user is one open session; the timeout timestamp is
    * re-armed to last-event + gap on every update, clamped above the
    * current watermark (re-arming at-or-below it is an error). */
  def sessionizeStreamEventTime(events: Dataset[SessionEventT], gapSec: Long,
                                delay: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.toDF().withWatermark("ts", delay).as[SessionEventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEventT], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start_s, s.last_s, s.n))
          } else {
            val sorted = rows.map(_.ts.getTime / 1000).toArray.sorted
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last_s <= gapSec =>
                  cur = Some(SessionState(s.start_s, t, s.n + 1))
                case Some(s) =>
                  out ::= SessionOut(user, s.start_s, s.last_s, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs + 1, (s.last_s + gapSec) * 1000))
            }
            out.reverseIterator
          }
      }
  }

  /** Streaming movement features — the incremental form of
    * `operators.Movement` (the reference processes timelapses
    * frame-by-frame; Dis/Trac/D2T/Vel are one-pass quantities, so the
    * per-track state is just (first position, last position, last ts,
    * path length) regardless of track length). Arithmetic matches the
    * batch window formulation step for step (same IEEE add order along
    * the track), so on identical in-order input the outputs are
    * bit-equal — the batch run is the oracle. Events are ordered by
    * event_id within a micro-batch; across batches the source must
    * deliver per-track data in order (the frame-by-frame model). */
  def movementStream(events: Dataset[MoveEvent],
                     framerate: Double = 0.0028): Dataset[MoveOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[MoveState, MoveOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[MoveEvent], state: GroupState[MoveState]) =>
          val sorted = rows.toArray.sortBy(_.event_id)
          var cur = state.getOption
          val out = sorted.map { e =>
            val (st, step, dt) = cur match {
              case None =>
                (MoveState(e.x, e.y, e.x, e.y, e.ts_s, 0.0), 0.0, 1L)
              case Some(s) =>
                val dx = e.x - s.lastX
                val dy = e.y - s.lastY
                val step = math.sqrt(dx * dx + dy * dy)
                val dt0 = e.ts_s - s.lastTs
                (MoveState(s.x0, s.y0, e.x, e.y, e.ts_s, s.trac + step), step,
                  if (dt0 == 0L) 1L else dt0)
            }
            cur = Some(st)
            val dis = math.sqrt((e.x - st.x0) * (e.x - st.x0) +
              (e.y - st.y0) * (e.y - st.y0))
            val d2t = if (st.trac == 0.0) 0.0 else dis / st.trac
            MoveOut(user, e.event_id, dis, st.trac, d2t, framerate * step / dt.toDouble)
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Stateful gap-based sessionization over an unbounded stream — the
    * open-ended form of `operators.Sessionize` (track building as
    * streaming state). State per user is one open session; a session
    * closes when a later event arrives past the gap, or when the
    * processing-time timeout fires with no new data. Used with
    * `flatMapGroupsWithState` so output is append-mode friendly.
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapSec: Long,
                       timeoutMs: Long = 30000L,
                       useTimeout: Boolean = true): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    // useTimeout=false keeps the query finite under Trigger.AvailableNow
    // (ProcessingTimeTimeout schedules micro-batches indefinitely) — the
    // in-batch/cross-batch gap logic is identical either way.
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start_s, s.last_s, s.n))
          } else {
            val sorted = rows.map(_.ts_s).toArray.sorted
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last_s <= gapSec =>
                  cur = Some(SessionState(s.start_s, t, s.n + 1))
                case Some(s) =>
                  out ::= SessionOut(user, s.start_s, s.last_s, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach(state.update)
            if (useTimeout) state.setTimeoutDuration(timeoutMs)
            out.reverseIterator
          }
      }
  }
}
