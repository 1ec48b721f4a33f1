package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{HtmlStream, PageAt}
import graft.text.Html

class HtmlStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def at(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def run(batches: Seq[Seq[PageAt]], keptOnly: Boolean) = {
    implicit val sql = spark.sqlContext
    n += 1
    val name = s"html_stream_$n"
    val stream = MemoryStream[PageAt]
    val q = HtmlStream.extracted(stream.toDS(), keptOnly = keptOnly)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  private val pages = Seq(
    PageAt(at(1), 1L, "<html><body><p>a real article with plenty of words" +
      " in it</p><a href=\"x\">ref</a></body></html>"),
    PageAt(at(2), 2L, "<a>Home</a> <a>About</a> <a>Contact</a> nav"),
    PageAt(at(3), 3L, "<script>window.x = 1;</script><p>short</p>"))

  test("streamed extraction is row-for-row identical to batch, across micro-batches") {
    val got = run(pages.map(Seq(_)), keptOnly = false)
      .collect().map(_.toString).sorted.toSeq
    val want = Html.extract(pages.toDF(), col("doc_id"), col("html"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && got.length == 3)
  }

  test("keptOnly drops boilerplate and short pages in-stream") {
    val got = run(Seq(pages), keptOnly = true).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(got.head.getAs[String]("text").startsWith("a real article"))
  }
}
