package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Id-grain snapshot diff — the complement of [[CorpusDiff]]'s
  * content-grain drift: between two corpus snapshots, which documents
  * were ADDED, REMOVED, or CHANGED (same id, different text)? The
  * audit table every versioned corpus keeps next to its releases
  * (incremental consumers re-embed exactly the added+changed set — at
  * 100 TB, re-processing unchanged documents is the whole cost).
  *
  * One full outer join on id; texts compare by xxhash64 so the join
  * carries 8-byte fingerprints, never documents (the
  * `Dedup.exactByHash` collision trade, declared there). Unchanged
  * rows are dropped by default — at snapshot scale they are the
  * overwhelming majority and the diff is the small output. */
object SnapshotDiff {

  def diff(a: DataFrame, aId: Column, aText: Column,
           b: DataFrame, bId: Column, bText: Column,
           keepUnchanged: Boolean = false): DataFrame = {
    val left = a.select(aId.as("doc_id"), xxhash64(aText).as("_ha"))
    val right = b.select(bId.as("doc_id"), xxhash64(bText).as("_hb"))
    val joined = left.join(right, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("_ha").isNull, lit("added"))
          .when(col("_hb").isNull, lit("removed"))
          .when(col("_ha") === col("_hb"), lit("unchanged"))
          .otherwise(lit("changed")))
    (if (keepUnchanged) joined else joined.filter(col("status") =!= "unchanged"))
      .select(col("doc_id"), col("status"))
  }

  /** The release-note rollup: counts per status (always includes
    * unchanged). */
  def summary(a: DataFrame, aId: Column, aText: Column,
              b: DataFrame, bId: Column, bText: Column): DataFrame =
    diff(a, aId, aText, b, bId, bText, keepUnchanged = true)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
