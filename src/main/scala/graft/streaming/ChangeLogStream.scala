package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One CDC change: key, a two-part version (the natural (ts-like,
  * unique-id) pair — unique per key by the [[graft.operators.ChangeLog]]
  * contract), the operation ('D' = delete, anything else upserts),
  * and the payload. */
case class CdcEvent(id: Long, ver1: Long, ver2: Long, op: String,
                    payload: String)

/** Per-key state and emission: the key's current winning row. `live`
  * is false when the latest operation is a delete — the key is out of
  * the snapshot but the emission still rides so sinks can retract. */
case class CdcState(ver1: Long, ver2: Long, op: String, payload: String)
case class CdcCurrent(id: Long, ver1: Long, ver2: Long, live: Boolean,
                      payload: String)

/** STREAMING CDC latest-state maintenance — the unbounded form of
  * [[graft.operators.ChangeLog.snapshot]]: each arriving change
  * max-merges into its key's state on the (ver1, ver2) order and the
  * key's new CURRENT row is emitted (update mode — one row per
  * touched key per micro-batch, the changelog a downstream
  * materialized view consumes).
  *
  * The state is a MAX over a total order — a join-semilattice — so
  * arrival order across micro-batches cannot change the result and a
  * replayed change is absorbed idempotently (max(x, x) = x): the
  * final state equals the batch snapshot over the same log, which is
  * the spec's parity pin. State per key is ONE row regardless of
  * history length — the streaming twin never holds the history the
  * batch aggregate's map-side partial also avoids shuffling. */
object ChangeLogStream {

  def snapshotStream(log: Dataset[CdcEvent]): Dataset[CdcCurrent] = {
    import log.sparkSession.implicits._
    log.groupByKey(_.id)
      .mapGroupsWithState[CdcState, CdcCurrent](GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[CdcEvent], state: GroupState[CdcState]) =>
          val best = (state.getOption.iterator ++
            rows.map(e => CdcState(e.ver1, e.ver2, e.op, e.payload)))
            .maxBy(s => (s.ver1, s.ver2))
          state.update(best)
          CdcCurrent(id, best.ver1, best.ver2, best.op != "D", best.payload)
      }
  }
}
