package graft

import org.apache.spark.sql.functions._
import graft.text.DatasetCard

class DatasetCardSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed card over a tiny corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the cat sat on the mat", "en"),  // exact dup
      (3L, "tiny", "fr"),                     // fails quality (1 token)
      (4L, "ein und zwei und drei und vier", "de")
    ).toDF("doc_id", "text", "lang")
    val r = DatasetCard.card(docs, col("doc_id"), col("text"), col("lang"))
      .head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_tokens") == 6L + 6L + 1L + 7L)
    assert(r.getAs[Long]("n_distinct_texts") == 3L)
    assert(r.getAs[Double]("dup_ratio") == 0.25)
    // quality: docs 1,2 pass ("the" stopwords); 3 too short; 4 has no
    // English stopwords -> keep_rate 0.5
    assert(r.getAs[Double]("keep_rate") == 0.5)
    assert(r.getAs[Long]("en_tokens") == 12L)
    assert(r.getAs[Long]("de_tokens") == 7L)
    assert(r.getAs[Long]("fr_tokens") == 1L)
    assert(r.getAs[Long]("other_tokens") == 0L)
  }

  test("unnamed languages fold into other_tokens; one-scan single aggregate plan") {
    val docs = Seq((1L, "alpha beta", "xx")).toDF("doc_id", "text", "lang")
    val r = DatasetCard.card(docs, col("doc_id"), col("text"), col("lang")).head()
    assert(r.getAs[Long]("other_tokens") == 2L && r.getAs[Long]("en_tokens") == 0L)
    // NULL lang mass must land in other_tokens too (the partition
    // invariant: named columns + other_tokens == n_tokens, always)
    val withNull = Seq((1L, "one two three", null.asInstanceOf[String]),
      (2L, "the cat", "en")).toDF("doc_id", "text", "lang")
    val rn = DatasetCard.card(withNull, col("doc_id"), col("text"), col("lang")).head()
    assert(rn.getAs[Long]("other_tokens") == 3L, "null-lang tokens vanished")
    assert(rn.getAs[Long]("en_tokens") == 2L)
    val plan = DatasetCard.card(Tables.documents(spark, sfDir),
      col("doc_id"), col("text"), col("lang")).queryExecution.executedPlan.toString
    // one scan of the corpus: a single FileScan in the whole plan
    assert(plan.split("FileScan").length - 1 == 1, s"expected ONE scan:\n${plan.take(600)}")
  }
}
