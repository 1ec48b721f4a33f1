package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{CardAt, CardStream}

class CardStreamSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long) = new Timestamp(sec * 1000L)
  private var n = 0

  private def runStream(batches: Seq[Seq[CardAt]]): Seq[org.apache.spark.sql.Row] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"card_stream_$n"
    val stream = MemoryStream[CardAt]
    val q = CardStream.windowedCard(stream.toDS(), windowSec = 60L,
        watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val flush = Seq(Seq(CardAt(at(100000L), -1L, "flush", "en")),
      Seq(CardAt(at(100001L), -2L, "flush", "en")))
    try (batches ++ flush).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).collect().toSeq
      .filter(_.getLong(0) < 100000L)
  }

  private def docs(w: Long) = Seq(
    CardAt(at(w + 1), 1, "the cat sat on the mat", "en"),
    CardAt(at(w + 2), 2, "the cat sat on the mat", "en"), // dup
    CardAt(at(w + 3), 3, "tiny", "fr"),
    CardAt(at(w + 4), 4, "ein und zwei und drei und vier", "de"))

  test("closed windows carry the batch card numbers (HLL estimate identical on same membership)") {
    val got = runStream(Seq(docs(0L), docs(60L)))
    assert(got.map(_.getLong(0)).toSet == Set(0L, 60L))
    // batch reference: same aggregates over the same rows
    val batch = docs(0L).toDF()
      .select(col("lang"), length(col("text")).cast("long").as("c"),
        size(split(col("text"), "\\s+")).cast("long").as("t"),
        graft.text.TextFeatures.qualityKeep(col("text")).cast("long").as("k"),
        xxhash64(col("text")).as("h"))
      .agg(count(lit(1)), sum("t"), sum("c"),
        approx_count_distinct(col("h")),
        graft.functions.Numeric.cround(avg(col("k")), 6)).head()
    val w0 = got.find(_.getLong(0) == 0L).get
    assert(w0.getLong(1) == batch.getLong(0))   // n_docs
    assert(w0.getLong(2) == batch.getLong(1))   // n_tokens
    assert(w0.getLong(3) == batch.getLong(2))   // n_chars
    assert(w0.getLong(4) == batch.getLong(3),
      "HLL estimate must match batch on identical membership")
    assert(w0.getDouble(5) == batch.getDouble(4))
    // language mix columns
    assert(w0.getAs[Long]("en_tokens") == 12L)
    assert(w0.getAs[Long]("de_tokens") == 7L)
    assert(w0.getAs[Long]("fr_tokens") == 1L)
  }

  test("micro-batch split within the watermark changes nothing") {
    val rows = docs(0L)
    val whole = runStream(Seq(rows)).find(_.getLong(0) == 0L).get
    val split = runStream(Seq(rows.take(2), rows.drop(2)))
      .find(_.getLong(0) == 0L).get
    assert(whole.toSeq == split.toSeq)
  }
}
