package graft

import graft.dedup.Decontaminate
import org.apache.spark.sql.functions._

class FuzzyDeconSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzy decon catches a paraphrased item the verbatim 8-gram gate misses") {
    val eval = Seq((100L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val corpus = Seq(
      // one mid-sequence edit: every 8-gram window crosses it (zero
      // verbatim 8-grams) but 7 of 10 distinct 3-grams survive
      (1L, "a b c d e f X h i j k l"),
      (2L, "totally unrelated words about nothing shared with the probe")
    ).toDF("doc_id", "text")
    val exact = Decontaminate.overlapPairs(corpus, col("doc_id"), col("text"),
      eval, col("doc_id"), col("text"), n = 8, minShared = 1L)
    assert(exact.count() == 0, "verbatim gate must miss the paraphrase")
    val fuzzy = Decontaminate.fuzzyOverlapPairs(corpus, col("doc_id"), col("text"),
        eval, col("doc_id"), col("text"), n = 3, minJaccard = 0.5)
      .as[(Long, Long, Long, Double)].collect()
    assert(fuzzy.map(r => (r._1, r._2)).toSet == Set((1L, 100L)))
    val j = fuzzy.head
    assert(j._3 == 7L)
    assert(j._4 == math.floor(7.0 / 13.0 * 1e6 + 0.5) / 1e6)
  }

  test("threshold gates: raising minJaccard drops the borderline pair") {
    val eval = Seq((100L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c d e f X h i j k l")).toDF("doc_id", "text")
    val strict = Decontaminate.fuzzyOverlapPairs(corpus, col("doc_id"), col("text"),
      eval, col("doc_id"), col("text"), n = 3, minJaccard = 0.8)
    assert(strict.count() == 0)
  }
}
