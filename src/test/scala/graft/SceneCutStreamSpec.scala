package graft

import graft.multimodal.{Binary, SceneCut}
import graft.streaming.{FrameIn, SceneCutStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SceneCutStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[FrameIn]], threshold: Double,
                        name: String) = {
    implicit val sql = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[FrameIn]
    val q = SceneCutStream.cuts(stream.toDS(), threshold, idleTimeoutMs = 0L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow())
    batches.foreach(b => stream.addData(b))
    val run = q.start()
    try assert(run.awaitTermination(60000)) finally run.stop()
    spark.table(name)
      .as[(Long, Int, Option[Double], Boolean, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
  }

  test("stream equals batch on the real decode output, incl. across micro-batches") {
    val docs = Tables.documents(spark, sfDir).limit(40)
    val frames = Binary.sampleFrameFeatures(spark, Binary.withPayload(docs),
        everyK = 2).toDF()
      .select(col("doc_id"), col("frame_idx"), col("mean_px"))
      .as[FrameIn].collect().toSeq
    val exp = SceneCut.cuts(frames.toDF(), threshold = 30.0)
      .as[(Long, Int, Option[Double], Boolean, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // one batch, and the same frames split mid-asset across two batches
    // (in-order arrival, the declared contract)
    val oneShot = runStream(Seq(frames), 30.0, "scs_one")
    assert(oneShot == exp)
    val (a, b) = frames.sortBy(f => (f.doc_id, f.frame_idx))
      .partition(f => f.frame_idx <= 2)
    val split = runStream(Seq(a, b), 30.0, "scs_split")
    assert(split == exp, "state must carry deltas across micro-batches")
  }

  test("out-of-order cross-batch arrival fails fast instead of mis-segmenting") {
    // frame 5 arrives in batch 1, then frame 3 in batch 2 — a violation
    // of the decode source's monotone-arrival contract. Computing the
    // delta against the wrong predecessor would silently diverge from
    // the batch operator, so the stream must throw. (Explicit
    // processAllAvailable boundaries: AvailableNow would fold both
    // adds into one micro-batch, where the in-batch sort absorbs the
    // disorder legitimately.)
    implicit val sql = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[FrameIn]
    val q = SceneCutStream.cuts(stream.toDS(), 30.0, idleTimeoutMs = 0L)
      .writeStream.format("memory").queryName("scs_ooo")
      .outputMode("append").start()
    val ex = try {
      stream.addData(Seq(FrameIn(7L, 5, 100.0)))
      q.processAllAvailable()
      stream.addData(Seq(FrameIn(7L, 3, 10.0)))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage != null && c.getMessage.contains("out-of-order frame")),
      s"expected the contract violation to surface, got: $ex")
  }
}
