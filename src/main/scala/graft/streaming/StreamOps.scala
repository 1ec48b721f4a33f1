package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Numeric._

/** Structured-streaming mirrors of the batch operators. The reference
  * processes timelapses frame-by-frame (an inherently incremental
  * model); here the same column pipeline serves both `read` and
  * `readStream` inputs — the batch run is the correctness oracle for
  * the streaming run.
  */
object StreamOps {

  /** Tumbling-window counts/sums per event_type. Works on batch and
    * (with the watermark) streaming inputs; in streaming mode state is
    * bounded by the watermark. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(events.withWatermark("ts", _)).getOrElse(events)
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("v_sum"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n"), col("v_sum"))
  }
}
