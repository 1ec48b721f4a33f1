package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch
import graft.streaming.StreamOps

/** The incremental quantile artifacts: union of per-batch bottom-k
  * sketches is BIT-EQUAL to a one-shot sketch (the semilattice
  * property), replays are absorbed by the sample, the artifact
  * round-trips through parquet, the estimate sits within a measured
  * quantile-rank bound of the exact percentile that tightens with k,
  * and the streaming windowed form equals the batch run. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.load(spark, sfDir, "events")

  private def sketchRows(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Seq[(Long, Double)])] =
    df.select(col("event_type"), col("n"),
        expr("transform(smp, x -> struct(x.pri AS _1, x.v AS _2))").as("smp"))
      .as[(String, Long, Seq[(Long, Double)])].collect()
      .map { case (t, n, smp) => t -> (n, smp) }.toMap

  test("union of batch sketches is bit-equal to the one-shot sketch") {
    val parts = Seq(0, 1, 2).map(i =>
      QuantileSketch.sketchBy(
        events.filter(pmod(col("event_id"), lit(3)) === i),
        Seq(col("event_type")), col("event_id"), col("value"), k = 32))
    val merged = QuantileSketch.unionSketches(
      parts.reduce(_ unionByName _), Seq("event_type"), k = 32)
    val oneShot = QuantileSketch.sketchBy(events,
      Seq(col("event_type")), col("event_id"), col("value"), k = 32)
    val got = sketchRows(merged)
    val want = sketchRows(oneShot)
    assert(got == want)
    assert(got.nonEmpty && got.values.forall(_._2.length == 32))
    // sample entries are sorted by (priority, value) — the pinned
    // artifact layout
    assert(got.values.forall { case (_, smp) => smp == smp.sorted })
  }

  test("a replayed batch leaves the merged SAMPLE identical (distinct pairs)") {
    val part = QuantileSketch.sketchBy(events,
      Seq(col("event_type")), col("event_id"), col("value"), k = 16)
    val once = sketchRows(QuantileSketch.unionSketches(
      part, Seq("event_type"), 16))
    val twice = sketchRows(QuantileSketch.unionSketches(
      part.unionByName(part), Seq("event_type"), 16))
    assert(once.keySet == twice.keySet)
    once.foreach { case (t, (n, smp)) =>
      assert(twice(t)._2 == smp) // the sample absorbs the replay
      assert(twice(t)._1 == 2 * n) // the exact count does not (the
      // exactly-once feed contract owns it, as for every store here)
    }
  }

  test("sketch artifacts round-trip through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("qsk").toString
    val part = QuantileSketch.sketchBy(events,
      Seq(col("event_type")), col("event_id"), col("value"), k = 16)
    part.write.mode("overwrite").parquet(dir)
    val back = QuantileSketch.unionSketches(
      spark.read.parquet(dir), Seq("event_type"), 16)
    assert(sketchRows(back) ==
      sketchRows(QuantileSketch.unionSketches(part, Seq("event_type"), 16)))
  }

  test("estimate sits within a quantile-rank bound of the exact percentile; k tightens it") {
    // exact quantile rank of the estimate: the fraction of population
    // values strictly below it must be near p/100
    def rankErr(k: Int): Double = {
      val sk = QuantileSketch.sketchBy(events, Seq(col("event_type")),
        col("event_id"), col("value"), k)
      val est = QuantileSketch.estimate(sk, Seq("event_type"), k, Seq(50))
        .select("event_type", "p50").as[(String, Double)].collect().toMap
      val pop = events.select(col("event_type"), col("value").cast("double"))
        .as[(String, Double)].collect().toSeq.groupBy(_._1)
      est.map { case (t, e) =>
        val vs = pop(t).map(_._2)
        math.abs(vs.count(_ < e).toDouble / vs.size - 0.5)
      }.max
    }
    val e64 = rankErr(64)
    val e512 = rankErr(512)
    assert(e64 <= 0.15, s"k=64 rank error $e64")
    assert(e512 <= 0.05, s"k=512 rank error $e512")
    assert(e512 < e64, s"larger k must tighten: $e512 vs $e64")
  }

  test("streaming windowed quantiles equal the batch run across micro-batches") {
    implicit val sql = spark.sqlContext
    val data = (0 until 40).map { i =>
      (Timestamp.valueOf(s"2024-01-01 0${i % 2}:${10 + i % 45}:00"),
        if (i % 3 == 0) "view" else "click", i.toLong, (i * 7 % 23).toDouble)
    }
    val stream = MemoryStream[(Timestamp, String, Long, Double)]
    val sdf = stream.toDF().toDF("ts", "event_type", "event_id", "value")
    val q = StreamOps.windowedQuantile(sdf, "1 hour",
        watermark = Some("10 minutes"), k = 8)
      .writeStream.format("memory").queryName("qsk_out")
      .outputMode("complete").start()
    // genuine micro-batches: the cross-batch sample merge is exercised
    try data.grouped(7).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("qsk_out")
      .as[(Long, String, Long, Int, Double, Double)].collect().toSet
    val exp = StreamOps.windowedQuantile(
        data.toDF("ts", "event_type", "event_id", "value"), "1 hour", k = 8)
      .as[(Long, String, Long, Int, Double, Double)].collect().toSet
    assert(got == exp)
    assert(got.nonEmpty)
  }
}
