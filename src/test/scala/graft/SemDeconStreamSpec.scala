package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{SemDeconStream, VecAt}
import graft.vector.SemDecontaminate

class SemDeconStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def at(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  // the q_sdecon slicing: vec_id % 17 == 0 is the eval suite
  private lazy val eval = emb.filter(col("vec_id") % 17 === 0)
    .select(col("vec_id").as("eval_id"), col("embedding"))
  private lazy val corpus = emb.filter(col("vec_id") % 17 =!= 0)

  private def runStream(batches: Seq[Seq[VecAt]], threshold: Double) = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"sdecon_stream_$n"
    val stream = MemoryStream[VecAt]
    val q = SemDeconStream.flagged(stream.toDS(), eval, threshold)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  test("streamed flags are row-for-row identical to the batch operator") {
    val rows = corpus.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    val arrivals = rows.zipWithIndex.map { case ((id, e), i) =>
      VecAt(at(i), id, e) }
    // two micro-batches: map-only flagging cannot depend on batching
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    val got = runStream(Seq(b1, b2), threshold = 0.4)
      .collect().map(_.toString).sorted.toSeq
    val want = SemDecontaminate.flag(corpus, col("vec_id"), col("embedding"),
        eval, col("eval_id"), col("embedding"), threshold = 0.4)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("an arrival equal to an eval vector flags at any sane threshold") {
    val leak = eval.limit(1)
      .select(col("eval_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().head
    val got = runStream(Seq(Seq(VecAt(at(1), 999999L, leak._2))), 0.99)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Int]("flagged") == 1 && r.getAs[Long]("eval_id") == leak._1)
    assert(math.abs(r.getAs[Double]("sim") - 1.0) < 1e-6)
  }
}
