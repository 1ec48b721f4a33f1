package graft

import org.apache.spark.sql.functions._

import graft.text.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def spans(counts: Seq[(Long, Long)], ctx: Long, width: Int = 0) =
    Packing.chunkSpans(counts.toDF("doc_id", "n"),
      col("doc_id"), col("n"), ctx, width)

  test("hand-computed offsets and chunk spans") {
    // tokens [3,5,2,9] at ctx=4: offsets 0,3,8,10
    val got = spans(Seq((1L, 3L), (2L, 5L), (3L, 2L), (4L, 9L)), ctx = 4L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 3L, 0L, 0L, 0L),   // tokens 0-2   -> chunk 0
      (2L, 5L, 3L, 0L, 1L),   // tokens 3-7   -> chunks 0-1
      (3L, 2L, 8L, 2L, 2L),   // tokens 8-9   -> chunk 2
      (4L, 9L, 10L, 2L, 4L))) // tokens 10-18 -> chunks 2-4
  }

  test("hand-computed per-chunk stats; every chunk but the last is full") {
    val sp = spans(Seq((1L, 3L), (2L, 5L), (3L, 2L), (4L, 9L)), ctx = 4L)
    val got = Packing.chunkStats(sp, ctx = 4L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 2L, 4L), (1L, 1L, 4L), (2L, 2L, 4L), (3L, 1L, 4L), (4L, 1L, 3L)))
  }

  test("offsets are invariant to the scan width") {
    val counts = (1L to 257L).map(i => (i * 7L % 1009L, 1L + i % 37L))
    val a = spans(counts, ctx = 64L, width = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = spans(counts, ctx = 64L, width = 7)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("offsets are the doc_id-ordered prefix sum; chunk tokens re-add to the total") {
    val counts = (0L until 100L).map(i => (i, 1L + (i * 13L) % 29L))
    val sp = spans(counts, ctx = 32L)
    val rows = sp.as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    var cum = 0L
    rows.foreach { case (_, n, off, _, _) =>
      assert(off === cum); cum += n
    }
    val chunkTotal = Packing.chunkStats(sp, 32L)
      .agg(sum("n_tokens")).as[Long].head()
    assert(chunkTotal === counts.map(_._2).sum)
  }

  test("zero-token documents occupy an empty span at their offset") {
    val got = spans(Seq((1L, 4L), (2L, 0L), (3L, 4L)), ctx = 4L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 4L, 0L, 0L, 0L), (2L, 0L, 4L, 1L, 1L), (3L, 4L, 4L, 1L, 1L)))
    // and chunkStats ignores them: chunk 1 holds only doc 3's tokens
    val st = Packing.chunkStats(
        spans(Seq((1L, 4L), (2L, 0L), (3L, 4L)), ctx = 4L), 4L)
      .as[(Long, Long, Long)].collect().toSet
    assert(st === Set((0L, 1L, 4L), (1L, 1L, 4L)))
  }
}
