package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC changelog → latest-state snapshot — the MERGE/compaction
  * materialization every incremental ingest needs (a crawl re-fetch
  * feed, an upstream database's change stream, a labeling system's
  * correction log): each key's CURRENT row is the one with the
  * highest version, and a key whose latest operation is a delete
  * leaves the snapshot. This is the batch view of what lakehouse
  * table formats call "merge-on-read compaction"; the snapshot is
  * what 30s (id-grain snapshot diff) and 22a (incremental dedup)
  * consume as "yesterday's state".
  *
  * Scale shape: ONE aggregation — `max_by(struct(payload),
  * struct(version))` — with map-side `partial_max_by`, so the
  * shuffle moves at most one candidate row per (key, map partition),
  * never the full history. (The struct-typed buffer makes Spark pick
  * SortAggregate over HashAggregate — the sort is per-map-partition
  * on the key; the shuffle-volume bound is what matters.) That beats
  * the textbook `ROW_NUMBER() ... WHERE rn = 1` window (a full
  * shuffle + sort of every key's history) on exactly the corpora
  * where it matters: long histories under heavy re-fetch. Struct comparison is
  * lexicographic on `verCols` in order.
  *
  * Contract: `verCols` must be unique per key (tie-break by
  * appending a unique id column — the natural (ts, event_id) pair);
  * with unique versions the aggregate is deterministic. Deletes are
  * rows whose `opCol` equals `deleteOp`; they participate in
  * versioning (a delete older than the latest upsert is superseded).
  *
  * Output: one row per live key — the key columns, then the version
  * and payload columns of its winning row. */
object ChangeLog {

  def snapshot(log: DataFrame, keyCols: Seq[String], verCols: Seq[String],
               opCol: String, deleteOp: String = "D"): DataFrame =
    latest(log, keyCols, verCols)
      .filter(col(opCol) =!= deleteOp).drop(opCol)

  /** The winning row per key INCLUDING delete tombstones — the
    * artifact form a persisted store needs: a deleted key keeps its
    * (key, version, op) row so a STALE out-of-order upsert arriving
    * later finds the delete's higher version and loses the max-merge
    * (drop the tombstone and the stale row would win unopposed,
    * silently resurrecting the key). [[snapshot]] is this filtered
    * to live rows. Tombstone retirement — dropping tombstones older
    * than the feed's out-of-order horizon — is periodic store
    * maintenance, not this operator's job. */
  def latest(log: DataFrame, keyCols: Seq[String],
             verCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && verCols.nonEmpty)
    val payload: Seq[String] =
      log.columns.filterNot(c => keyCols.contains(c)).toSeq
    val last = log.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(verCols.map(col): _*)).as("_last"))
    val outCols: Seq[Column] = keyCols.map(col) ++
      payload.map(c => col(s"_last.$c").as(c))
    last.select(outCols: _*)
  }
}
