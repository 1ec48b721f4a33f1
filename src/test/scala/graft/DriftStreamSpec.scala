package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{DriftStream, TextAt}

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long) = new Timestamp(sec * 1000L)
  private var n = 0

  private def runStream(batches: Seq[Seq[TextAt]], ref: graft.streaming.DriftRef,
                        windowSec: Long): Seq[(Long, Int, Long)] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"drift_stream_$n"
    val stream = MemoryStream[TextAt]
    val q = DriftStream.windowBucketCounts(stream.toDS(), ref, windowSec,
        watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val flush = Seq(Seq(TextAt(at(100000L), "flushtoken")),
      Seq(TextAt(at(100001L), "flushtoken")))
    try (batches ++ flush).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[(Long, Int, Long)].collect().toSeq
      .filter(_._1 < 100000L)
  }

  test("reference model: top-V index, smoothed probs sum to <= 1 with OOV") {
    val docs = Seq((1L, "a a a b b c")).toDF("id", "text")
    val ref = DriftStream.reference(docs, col("text"), topV = 2)
    assert(ref.index == Map("a" -> 0, "b" -> 1))
    // counts: a=3, b=2, tail (c)=1, grand total 6, v = 3 buckets —
    // the OOV bucket carries the ACTUAL tail mass, add-one smoothed
    assert(math.abs(ref.probs(0) - 4.0 / 9) < 1e-12)
    assert(math.abs(ref.probs(1) - 3.0 / 9) < 1e-12)
    assert(math.abs(ref.probs(-1) - 2.0 / 9) < 1e-12)
    // a window drawn from the reference itself scores near zero even
    // though a third of its tokens are OOV (the phantom-drift case a
    // smoothed-zero OOV bucket fails)
    val selfCounts = Seq((0L, 0, 3L), (0L, 1, 2L), (0L, -1, 1L))
      .toDF("window_start", "bucket", "cnt")
    val selfKl = DriftStream.klPerWindow(selfCounts, ref)
      .head().getDouble(1)
    assert(selfKl < 0.05, s"self-drift must be near zero, got $selfKl")
  }

  test("stream window counts equal batch bucket counts; KL flags the drifted window") {
    val refDocs = Seq((1L, ("alpha " * 50 + "beta " * 30 + "gamma " * 20).trim))
      .toDF("id", "text")
    val ref = DriftStream.reference(refDocs, col("text"), topV = 3)
    // window 0: reference-like; window 60: OOV flood (drifted)
    val w0 = Seq(TextAt(at(5L), "alpha beta alpha gamma alpha beta"))
    val w1 = Seq(TextAt(at(65L), "zzz yyy xxx www vvv uuu"))
    val got = runStream(Seq(w0, w1), ref, 60L)
    // batch parity on the same rows
    val batch = (w0 ++ w1).toDF()
      .select((col("ts").cast("long").divide(60)).cast("long").multiply(60).as("window_start"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .withColumn("bucket",
        coalesce(element_at(typedLit(ref.index), col("tok")), lit(-1)))
      .groupBy("window_start", "bucket").agg(count(lit(1)).as("cnt"))
      .as[(Long, Int, Long)].collect().toSeq
    assert(got.toSet == batch.toSet, s"stream $got vs batch $batch")
    val kl = DriftStream.klPerWindow(got.toDF("window_start", "bucket", "cnt"), ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kl(60L) > kl(0L) + 0.5, s"drifted window must stand out: $kl")
    assert(kl(0L) >= 0.0 && kl(60L) >= 0.0)
  }

  test("klPerWindow counts absent buckets' smoothed mass (all-OOV window)") {
    val ref = DriftStream.reference(
      Seq((1L, "a b c d")).toDF("id", "text"), col("text"), topV = 4)
    val counts = Seq((0L, -1, 10L)).toDF("window_start", "bucket", "cnt")
    val kl = DriftStream.klPerWindow(counts, ref).head()
    // 5 buckets contribute: OOV with near-all mass + 4 in-vocab at the
    // smoothed floor — the sum must be the full-grid value, > 1 nat
    assert(kl.getDouble(1) > 1.0)
    assert(kl.getLong(2) == 10L)
  }
}
