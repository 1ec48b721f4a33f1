package graft

import org.apache.spark.sql.functions._
import graft.ml.Models

class TextClassifierSpec extends SparkSpec {

  test("distills the qualityKeep gate from hashed token features on real docs") {
    val docs = Tables.documents(spark, sfDir)
    val label = graft.text.TextFeatures.qualityKeep(col("text")).cast("int")
    val out = Models.textClassifier(docs, col("doc_id"), col("text"), label).cache()
    // scored every doc
    assert(out.count() == docs.count())
    // held-out slice (the hashSplit test bucket) accuracy: the gate is
    // a function of token counts and stopword presence, which hashed
    // bag-of-token features carry — a linear model must recover it
    val test = out.filter(pmod(xxhash64(col("doc_id")), lit(5)) === 0)
    val acc = test.filter(col("label") === col("prediction")).count().toDouble /
      test.count()
    assert(acc >= 0.8, s"held-out accuracy $acc")
    // scores are calibrated-ish: mean P(keep) higher on keeps
    val m = out.groupBy(col("label")).agg(avg(col("score")).as("s"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(m(1.0) > m(0.0) + 0.2, s"score separation $m")
    out.unpersist()
  }

  test("prediction decisions are stable across two fits on the same data") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    def fitOnce() = Models.textClassifier(docs, col("doc_id"), col("text"),
        graft.text.TextFeatures.qualityKeep(col("text")).cast("int"))
      .select("doc_id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = fitOnce(); val b = fitOnce()
    // LBFGS float reductions may wiggle probabilities in the last ulps;
    // the argmax decision must not flip on a refit of identical data
    assert(a == b, "refit flipped predictions")
  }
}
