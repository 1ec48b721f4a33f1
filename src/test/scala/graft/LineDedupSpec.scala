package graft

import org.apache.spark.sql.functions._

import graft.text.LineDedup

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "accept all cookies"

  private def docs = Seq(
    (1L, s"real content one\n$boiler\nmore content"),
    (2L, s"$boiler\nsecond doc body"),
    (3L, s"third doc intro\nclosing words\n$boiler"),
    (4L, boiler),                      // nothing but boilerplate
    (5L, "untouched document\nno shared lines")
  ).toDF("doc_id", "text")

  test("a line over the document-frequency cap vanishes corpus-wide, order kept") {
    val got = LineDedup.dedupLines(docs, col("doc_id"), col("text"), maxDocs = 2L)
      .as[(Long, String, Long, Long)].collect().toMap2
    assert(got(1L) === (("real content one\nmore content", 2L, 1L)))
    assert(got(2L) === (("second doc body", 1L, 1L)))
    assert(got(3L) === (("third doc intro\nclosing words", 2L, 1L)))
    assert(got(4L) === (("", 0L, 1L)))
    assert(got(5L) === (("untouched document\nno shared lines", 2L, 0L)))
  }

  test("below the cap nothing is removed") {
    val got = LineDedup.dedupLines(docs, col("doc_id"), col("text"), maxDocs = 4L)
      .as[(Long, String, Long, Long)].collect()
    assert(got.forall(_._4 == 0L))
    val d1 = got.find(_._1 == 1L).get
    assert(d1._2 === s"real content one\n$boiler\nmore content")
  }

  test("within-doc repetition alone does not trigger the corpus filter") {
    val rep = Seq((1L, "same line\nsame line\nsame line"), (2L, "other text"))
      .toDF("doc_id", "text")
    val got = LineDedup.dedupLines(rep, col("doc_id"), col("text"), maxDocs = 1L)
      .filter($"doc_id" === 1L).as[(Long, String, Long, Long)].head()
    // "same line" occurs in ONE distinct doc -> df=1, not over the cap
    assert(got._2 === "same line\nsame line\nsame line" && got._4 === 0L)
  }

  test("null text yields zero counts, not negatives") {
    val withNull = Seq((1L, "kept line"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = LineDedup.dedupLines(withNull, col("doc_id"), col("text"), 5L)
      .as[(Long, String, Long, Long)].collect().toMap2
    assert(got(2L) === (("", 0L, 0L)))
    assert(got(1L) === (("kept line", 1L, 0L)))
  }

  implicit private class MapOps(rows: Array[(Long, String, Long, Long)]) {
    def toMap2: Map[Long, (String, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
