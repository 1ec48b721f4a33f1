package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{SessionEvent, SessionOut, StreamOps}

class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  // Trigger.AvailableNow + awaitTermination: with ProcessingTimeTimeout,
  // processAllAvailable() never settles (the timeout machinery keeps
  // scheduling micro-batches); a bounded run is the deterministic way to
  // drive a stateful query in tests.
  private def runOnce(stream: MemoryStream[SessionEvent], name: String, gap: Long): Unit = {
    val q = StreamOps.sessionizeStream(stream.toDS(), gapSec = gap, useTimeout = false)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(60000), "query did not finish") finally q.stop()
  }

  test("gap closes an earlier session; open session stays unemitted") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    stream.addData(SessionEvent(1L, 0L), SessionEvent(1L, 100L))
    stream.addData(SessionEvent(1L, 5000L), SessionEvent(2L, 10L))
    runOnce(stream, "sess_out", gap = 1000L)
    val closed = spark.table("sess_out").as[SessionOut].collect().toSet
    assert(closed == Set(SessionOut(1L, 0L, 100L, 2L)))
  }

  test("multiple in-batch sessions are split and emitted") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    stream.addData(SessionEvent(7L, 0L), SessionEvent(7L, 5L),
      SessionEvent(7L, 100L), SessionEvent(7L, 300L))
    runOnce(stream, "sess_out2", gap = 10L)
    val closed = spark.table("sess_out2").as[SessionOut].collect().toSet
    assert(closed == Set(SessionOut(7L, 0L, 5L, 2L), SessionOut(7L, 100L, 100L, 1L)))
  }
}
