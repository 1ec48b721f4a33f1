package graft

import graft.text.Chunker
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def naive(tokens: Seq[String], width: Int, stride: Int)
      : Seq[(Int, Int, Int, String)] = {
    val n = tokens.length
    val extra = math.max(0, math.ceil((n - width).toDouble / stride).toInt)
    (0 to extra).map { k =>
      val start = k * stride
      val len = math.min(width, n - start)
      (k, start, len, tokens.slice(start, start + len).mkString(" "))
    }
  }

  private def run(texts: Seq[String], width: Int, stride: Int) =
    Chunker.chunks(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), col("doc_id"), col("text"), width, stride)
      .as[(Long, Int, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)
        .map(r => (r._2, r._3, r._4, r._5)).toSeq).toMap

  test("chunks match the naive sliding window incl. overlap and tail") {
    val docs = Seq(
      (1 to 10).map(i => s"w$i").mkString(" "),  // n > width, uneven tail
      (1 to 4).map(i => s"w$i").mkString(" "),   // n == width
      (1 to 3).map(i => s"w$i").mkString(" "),   // n < width
      (1 to 8).map(i => s"w$i").mkString(" "))   // stride-divisible
    val got = run(docs, width = 4, stride = 2)
    docs.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == naive(t.split("\\s+").toSeq, 4, 2),
        s"doc $i") }
  }

  test("every token is covered and consecutive chunks overlap by width-stride") {
    val toks = (1 to 23).map(i => s"t$i")
    val got = run(Seq(toks.mkString(" ")), width = 8, stride = 5)(0L)
    assert(got.head._2 == 0)
    assert(got.last._2 + got.last._3 == 23, "last chunk reaches the end")
    got.sliding(2).foreach {
      case Seq((_, s1, l1, _), (_, s2, _, _)) =>
        assert(s2 - s1 == 5); assert(s1 + l1 > s2, "windows overlap")
      case _ =>
    }
  }

  test("short and single-token docs are exactly one chunk") {
    val got = run(Seq("only three words", "one"), 64, 32)
    assert(got(0L) == Seq((0, 0, 3, "only three words")))
    assert(got(1L) == Seq((0, 0, 1, "one")))
  }

  test("no-overlap stride == width tiles the doc") {
    val toks = (1 to 9).map(_.toString)
    val got = run(Seq(toks.mkString(" ")), width = 4, stride = 4)(0L)
    assert(got.map(_._2) == Seq(0, 4, 8))
    assert(got.map(_._3) == Seq(4, 4, 1))
    assert(got.flatMap(_._4.split(" ")).toSeq == toks)
  }
}
