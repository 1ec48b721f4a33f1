package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One timestamped document on the monitoring stream. */
case class TextAt(ts: Timestamp, text: String)

/** A drift-monitor reference model: the top-V reference tokens (index
  * 0..V-1) with add-one-smoothed probabilities, plus the OOV bucket
  * (index -1) holding everything else. Driver-sized by construction —
  * V is fixed, never vocabulary-sized. */
case class DriftRef(index: Map[String, Int], probs: Map[Int, Double])

/** Streaming corpus-drift monitoring — the streaming surface of
  * [[graft.text.CorpusDiff]] (SURVEY §2.3 row 30r): a live ingest feed
  * is compared window-by-window against a REFERENCE token
  * distribution, and a window whose KL divergence jumps is the alarm
  * (crawler broke, a source flipped language, spam flood) — the check
  * that must run BEFORE data lands in the corpus, which is exactly
  * why it cannot be the batch drift report.
  *
  * Shape: the reference model is a driver-sized artifact (top-V
  * tokens + OOV bucket — the bounded-vocabulary trick every LM
  * operator here uses); tokens map to bucket indices MAP-SIDE via a
  * broadcast literal map, so the only streaming state is a windowed
  * (window, bucket) count — Spark's native watermark-closed windowed
  * aggregation, emitted once per window in append mode. [[klPerWindow]]
  * is the batch finalize over those V+1-row window summaries
  * (stream proposes counts, batch computes the divergence — the
  * HeavyHitterStream/SampleStream pattern), and batch/stream parity
  * is exact because the counts are exact. */
object DriftStream {

  /** Build the reference from a static corpus: top-V tokens by count
    * (ties break on token), add-one-smoothed probabilities over the
    * V+1 buckets. The OOV bucket (-1) holds the reference's ACTUAL
    * tail mass — every token beyond the top V — not a smoothed zero:
    * on Zipfian text the tail is a large constant share of any normal
    * window, and pricing it at ~1/total would charge every undrifted
    * window several nats of phantom drift, burying the real alarm.
    * The corpus is tokenized ONCE: both the top-V head and the grand
    * total are read off the same persisted vocab-sized count table
    * (the tail mass is their difference — no second explode pass). */
  def reference(df: DataFrame, text: org.apache.spark.sql.Column,
                topV: Int = 256): DriftRef = {
    require(topV >= 1)
    val toks = df.select(explode(split(lower(text), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    // ONE tokenize/explode pass over the reference corpus: the vocab-
    // sized count table is persisted, both the top-V head and the grand
    // total read it, and it unpersists before returning (both actions
    // are internal, so cleanup is synchronous — no listener needed)
    val countTable = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = countTable
      .orderBy(col("c").desc, col("tok")).limit(topV)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val grandTotal = countTable.agg(sum("c")).collect()
      .headOption.flatMap(r => Option(r.get(0))).map(_.asInstanceOf[Long])
      .getOrElse(0L)
    countTable.unpersist(blocking = false)
    val index = counts.map(_._1).zipWithIndex.toMap
    val tail = grandTotal - counts.map(_._2).sum
    val v = counts.length + 1
    val probs = counts.zipWithIndex.map { case ((_, c), i) =>
      i -> (c + 1.0) / (grandTotal + v)
    }.toMap + (-1 -> (tail + 1.0) / (grandTotal + v))
    DriftRef(index, probs)
  }

  /** Watermark-closed per-window bucket counts: (window_start, bucket,
    * cnt). Bucket mapping is a map-side literal lookup (index size V,
    * broadcast with the task closure); no per-token state survives the
    * window. */
  def windowBucketCounts(docs: Dataset[TextAt], ref: DriftRef,
                         windowSec: Long,
                         watermarkDelay: String = "10 seconds"): DataFrame = {
    require(windowSec > 0)
    val mapping = typedLit(ref.index)
    docs.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(window(col("ts"), s"$windowSec seconds").as("w"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("bucket", coalesce(element_at(mapping, col("tok")), lit(-1)))
      .groupBy(col("w"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("long").as("window_start"),
        col("bucket"), col("cnt"))
  }

  /** Batch finalize: per-window KL(window || reference) over the V+1
    * buckets, window side add-one smoothed so empty buckets contribute
    * finitely. Input = closed-window counts (streamed or batch — the
    * parity surface). */
  def klPerWindow(counts: DataFrame, ref: DriftRef): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val refDf = broadcast(ref.probs.toSeq.toDF("bucket", "ref_p"))
    val v = ref.probs.size
    val totals = counts.groupBy("window_start").agg(sum("cnt").as("_n"))
    // full V+1-bucket grid per window: buckets the window never saw
    // still carry their smoothed mass (a partial sum would understate
    // the divergence of exactly the most-drifted windows)
    totals.crossJoin(refDf)
      .join(counts, Seq("window_start", "bucket"), "left")
      .withColumn("_c", coalesce(col("cnt"), lit(0L)))
      .withColumn("_p", (col("_c") + lit(1.0)) / (col("_n") + lit(v.toDouble)))
      .withColumn("_term", col("_p") * log(col("_p") / col("ref_p")))
      .groupBy("window_start")
      .agg(graft.functions.Numeric.cround(sum(col("_term")), 8).as("kl"),
        sum(col("_c")).as("n_tokens"))
  }
}
