package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{CorpusStream, DocAt}

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def at(i: Long) = new Timestamp(i * 1000L)
  private val evalText = "the quick brown fox jumps over the lazy sleeping dog"

  private def evalDf = Seq((100L, evalText)).toDF("doc_id", "text")

  // mirrors CorpusBuildSpec minus the near-dup stage (declared
  // batch-only): 2 fails quality, 3 is an exact dup, 5 is
  // contaminated, 7 is sampled out; 4 (a near-dup of 1) SURVIVES here
  private def batches = Seq(
    Seq(
      DocAt(at(1), 1L, "the cat sat on a mat and watched the birds fly", "en", "web"),
      DocAt(at(2), 2L, "too short", "en", "web"),
      DocAt(at(3), 4L, "the cat sat on a mat and watched the birds soar", "en", "web")),
    Seq( // exact dup arrives in a LATER micro-batch — still dropped
      DocAt(at(4), 3L, "the cat sat on a mat and watched the birds fly", "en", "web"),
      DocAt(at(5), 5L, s"intro the words $evalText the end closing", "en", "web")),
    Seq(
      DocAt(at(6), 6L, "a bird in the hand is worth two in the bush today", "en", "web"),
      DocAt(at(7), 7L, "the sun and the moon and the stars shine bright tonight", "xx", "web"))
  )

  private def run(rates: Map[String, Double]): Set[Long] = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"corpus_stream_$n"
    val stream = MemoryStream[DocAt]
    val q = CorpusStream.filtered(stream.toDS(), evalDf, rates = rates)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).select("doc_id").as[Long].collect().toSet
  }

  test("per-document gates drop quality, exact-dup, contaminated and sampled docs") {
    assert(run(Map("xx" -> 0.0)) === Set(1L, 4L, 6L))
  }

  test("without rates the sampled language survives") {
    assert(run(Map.empty) === Set(1L, 4L, 6L, 7L))
  }

  test("parity with the batch stages it mirrors") {
    import org.apache.spark.sql.functions._
    val flat = batches.flatten
    val docs = flat.map(d => (d.doc_id, d.text, d.lang, d.source))
      .toDF("doc_id", "text", "lang", "source")
    // batch reference: quality + exact dedup (min id == first arrival
    // here: ids arrive in dup-after-original order) + decon + sampling
    val q = docs.filter(graft.text.TextFeatures.qualityKeep(col("text")))
    val ex = q.join(
      q.groupBy(xxhash64(col("text")).as("_h"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val dc = graft.dedup.Decontaminate.clean(ex, col("doc_id"), col("text"),
      evalDf, col("doc_id"), col("text"), n = 8)
    val want = graft.text.TextFeatures.sampleStratified(
        dc, col("doc_id"), col("lang"), Map("xx" -> 0.0), 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(run(Map("xx" -> 0.0)) === want)
  }
}
