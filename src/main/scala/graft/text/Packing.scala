package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence packing: assign every document a global token OFFSET in
  * the doc_id-ordered concatenation of the corpus, and from it the
  * context-window chunks the document lands in — the step between a
  * filtered corpus and a training run (documents are concatenated in a
  * deterministic order and sliced into fixed `ctx`-token sequences;
  * a document spans chunks floor(offset/ctx) .. floor((offset+n-1)/ctx)).
  *
  * The offset is a GLOBAL prefix sum, which a naive window
  * (`sum over (order by doc_id)` with no partition key) computes on a
  * single task — a non-starter at corpus scale. This operator runs the
  * classic two-level distributed scan instead:
  *
  *  1. range-partition by doc_id (`width` partitions — contiguous,
  *     ordered key ranges), and compute per-partition LOCAL cumulative
  *     sums with a window keyed by the partition id (parallel across
  *     partitions);
  *  2. collect the `width` per-partition totals (driver-bounded: one
  *     row per partition, independent of corpus size), prefix-scan
  *     them on the driver, and broadcast the partition-offset table
  *     back for a map-side add.
  *
  * Offsets depend only on the doc_id ORDER, not on where the range
  * boundaries land, so the result is invariant to `width` and to AQE
  * re-planning (spec-pinned). Zero-token documents (cannot arise from
  * whitespace token counts, which are >= 1) occupy zero chunk span and
  * report chunk_first = chunk_last = floor(offset/ctx).
  */
object Packing {

  /** Per-document chunk spans: (doc_id, n_tokens, offset, chunk_first,
    * chunk_last). `width` <= 0 uses the session shuffle parallelism. */
  def chunkSpans(df: DataFrame, id: Column, nTokens: Column, ctx: Long,
                 width: Int = 0): DataFrame = {
    require(ctx >= 1L)
    val spark = df.sparkSession
    import spark.implicits._
    val w =
      if (width > 0) width
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .repartitionByRange(w, col("doc_id"))
      .withColumn("_part", spark_partition_id())
    val win = Window.partitionBy("_part").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // persist before the totals collect so the partition ids the
    // prefix table was built from are exactly the ones joined against
    // (the collect itself is the materializing action — no separate
    // count pass needed)
    val local = base.withColumn("_cum", sum("n_tokens").over(win))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val totals = local.groupBy("_part").agg(max("_cum").as("_tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val prefix = totals.scanLeft((0, 0L)) { case ((_, acc), (p, t)) =>
      (p, acc + t)
    } // scan pairs part p with the sum of totals up to AND INCLUDING p
    val prefDf = totals.map(_._1).zip(prefix.map(_._2).init)
      .toSeq.toDF("_part", "_pref") // part -> sum of totals BEFORE it
    // the returned plan is local's last reader (best-effort cleanup)
    graft.functions.CacheRelease.afterNextExecution(local)
    local.join(broadcast(prefDf), Seq("_part"))
      .withColumn("offset", col("_pref") + col("_cum") - col("n_tokens"))
      .withColumn("chunk_first",
        floor(col("offset") / lit(ctx.toDouble)).cast("long"))
      .withColumn("chunk_last",
        floor((col("offset") + greatest(col("n_tokens"), lit(1L)) - 1L)
          / lit(ctx.toDouble)).cast("long"))
      .select("doc_id", "n_tokens", "offset", "chunk_first", "chunk_last")
  }

  /** Per-chunk packing stats over [[chunkSpans]] output: how many
    * documents touch each `ctx`-token chunk and how many of its tokens
    * are filled (every chunk except the last is exactly full —
    * spec-pinned). The explode fanout is bounded: a document adds one
    * row per chunk it SPANS, so total rows ~ total_tokens/ctx + n_docs.
    */
  def chunkStats(spans: DataFrame, ctx: Long): DataFrame = {
    require(ctx >= 1L)
    spans.filter(col("n_tokens") > 0L)
      .withColumn("chunk_id",
        explode(sequence(col("chunk_first"), col("chunk_last"))))
      .withColumn("_tok",
        least(col("offset") + col("n_tokens"), (col("chunk_id") + 1L) * ctx)
          - greatest(col("offset"), col("chunk_id") * ctx))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("_tok").as("n_tokens"))
  }
}
