package graft

import org.apache.spark.sql.functions._
import graft.text.TextFeatures

class EncodingQualitySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    TextFeatures.encodingQuality(rows.toDF("id", "text"), col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap

  test("counts replacement chars and non-whitespace control chars") {
    val out = run(
      (1L, "clean prose with nothing wrong"),
      (2L, "moji�bake he�re"),
      (3L, "binaryspill"),
      (4L, "tabs\tand\nnewlines\rare fine"))
    assert(out(1L) == ((0, 0, 0.0)))
    assert(out(2L)._1 == 2 && out(2L)._2 == 0)
    assert(out(3L)._1 == 0 && out(3L)._2 == 3)
    // \t \n \r are whitespace, not junk
    assert(out(4L) == ((0, 0, 0.0)))
  }

  test("junk_ratio arithmetic") {
    val out = run((1L, "ab"))   // 2 junk / 4 chars
    assert(out(1L)._3 == 0.5)
  }

  test("q_enc planted construction yields both junk classes on real events") {
    val out = SparkEntry.queries("q_enc")(spark, sfDir)
    val agg = out.agg(sum("n_replacement"), sum("n_control")).head()
    assert(agg.getLong(0) > 0 && agg.getLong(1) > 0)
  }
}
