package graft

import org.apache.spark.sql.functions._
import graft.text.TextFeatures

class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def deflateRef(s: String): Long = {
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end(); n
  }

  test("kernel matches direct java.util.zip deflate on real documents") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val got = TextFeatures.compressionRatio(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == deflateRef(t), s"doc $id deflate size")
    }
  }

  test("repetitive text sits far below the prose band; high-entropy text near 1") {
    val rep = "spam " * 500
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "considers several further adventures in the meadow nearby ") * 20
    // deterministic high-entropy junk: hex of mixed hashes (no RNG)
    val junk = (0 until 400).map(i =>
      java.lang.Long.toHexString(graft.functions.Mix64.compute(i.toLong))).mkString
    val out = TextFeatures.compressionRatio(
      Seq((1L, rep), (2L, prose), (3L, junk)).toDF("id", "text"),
      col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < 0.05, s"repetition ratio ${out(1L)}")
    assert(out(2L) > out(1L) && out(2L) < 0.6, s"prose ratio ${out(2L)}")
    assert(out(3L) > 0.5, s"junk ratio ${out(3L)}")
  }

  test("empty text is filtered out; determinism across runs") {
    val df = Seq((1L, ""), (2L, "hello hello hello")).toDF("id", "text")
    val a = TextFeatures.compressionRatio(df, col("id"), col("text")).collect()
    assert(a.map(_.getLong(0)).toSeq == Seq(2L))
    val b = TextFeatures.compressionRatio(df, col("id"), col("text")).collect()
    assert(a.map(_.getLong(2)).toSeq == b.map(_.getLong(2)).toSeq)
  }
}
