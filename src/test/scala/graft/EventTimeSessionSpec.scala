package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{SessionEventT, SessionOut, StreamOps}

/** Event-time sessionization: a session must be emitted when the
  * WATERMARK (data progress) passes its end + gap — not before, and
  * without any wall-clock waiting. */
class EventTimeSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("watermark progress closes the session; no emission before") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[SessionEventT]
    val q = StreamOps.sessionizeStreamEventTime(stream.toDS(), gapSec = 1000L,
        delay = "10 seconds")
      .writeStream.format("memory").queryName("et_sess")
      .outputMode("append").start()
    try {
      // batch 1: open session for user 1 (events at 20s and 100s —
      // epoch 0 would equal the INITIAL watermark and be dropped as
      // late: the filter is eventTime <= watermark)
      stream.addData(SessionEventT(1L, ts(20)), SessionEventT(1L, ts(100)))
      q.processAllAvailable()
      assert(spark.table("et_sess").count() == 0, "emitted before watermark passed")
      // batch 2: user 2 far in the future advances the watermark to ~4990s
      stream.addData(SessionEventT(2L, ts(5000)))
      q.processAllAvailable()
      // batch 3: any further progress lets the timeout fire for user 1
      stream.addData(SessionEventT(2L, ts(5001)))
      q.processAllAvailable()
      val closed = spark.table("et_sess").as[SessionOut].collect().toSet
      assert(closed == Set(SessionOut(1L, 20L, 100L, 2L)),
        s"expected user 1's session closed by watermark, got $closed")
    } finally q.stop()
  }
}
