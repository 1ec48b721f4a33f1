package graft

import org.apache.spark.sql.functions._

import graft.text.Dsir

/** [[graft.text.Dsir]] — importance scores vs a string-level
  * brute-force replica (same smoothing, same decimal(…,8) sum
  * contract), and the Gumbel-top-k sample's determinism/containment
  * properties. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  /** String-grain replica of the scored pass: normalize, count
    * bigrams, train both add-one-smoothed models over the shared
    * vocabulary, and sum k·(lp_t − lp_r) through the same
    * BigDecimal-at-scale-8 path as [[graft.functions.BigramModel]]. */
  private def brute(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Double)] = {
    val per = docs
      .map { case (id, t, tg) =>
        (id, tg, t.toLowerCase.replaceAll("[^a-z0-9 ]", "#")) }
      .filter(_._3.length >= 2)
      .map { case (id, tg, t) =>
        (id, tg, t.sliding(2).toSeq.groupBy(identity)
          .map { case (g, v) => g -> v.size.toLong }) }
    val model = per.flatMap(d => d._3.map { case (g, k) => (g, k, d._2) })
      .groupBy(_._1)
      .map { case (g, rows) =>
        g -> (rows.map(_._2).sum, rows.filter(_._3).map(_._2).sum) }
    val v = model.size.toLong
    val tot = model.valuesIterator.map(_._1).sum
    val totT = model.valuesIterator.map(_._2).sum
    val lp = model.map { case (g, (c, ct)) =>
      g -> (StrictMath.log((ct + 1.0) / (totT + v).toDouble) -
        StrictMath.log((c + 1.0) / (tot + v).toDouble)) }
    per.map { case (id, _, grams) =>
      val n = grams.valuesIterator.sum
      val sq8 = grams.iterator.map { case (g, k) =>
        new java.math.BigDecimal(java.lang.Double.toString(k * lp(g)))
          .setScale(8, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact() }.sum
      val s = new java.math.BigDecimal(
        java.math.BigInteger.valueOf(sq8), 8).doubleValue()
      id -> (n, math.floor(s / n * 1e6 + 0.5) / 1e6)
    }.toMap
  }

  test("scores match the brute-force replica on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60)
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t, id % 11 == 0) }
    val got = Dsir.scores(docs.toDF("doc_id", "text", "tgt"),
        col("doc_id"), col("text"), col("tgt"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == brute(docs))
  }

  test("target-like docs outscore target-unlike docs") {
    val docs = Seq(
      (1L, "aa aa aa aa", true),
      (2L, "aa aa aa aa", false),   // identical to the target slice
      (3L, "zz zz zz zz", false))   // disjoint from it
    val s = Dsir.scores(docs.toDF("doc_id", "text", "tgt"),
        col("doc_id"), col("text"), col("tgt"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(s(2L) == s(1L))    // same text, same score: tgt only shapes the model
    assert(s(2L) > s(3L))
    assert(s == brute(docs).map { case (id, (_, a)) => id -> a })
  }

  test("sub-bigram docs are dropped; empty target slice still scores") {
    val docs = Seq((1L, "x", false), (2L, "!", false), (3L, "ab ab", false))
    val s = Dsir.scores(docs.toDF("doc_id", "text", "tgt"),
        col("doc_id"), col("text"), col("tgt"))
      .as[(Long, Long, Double)].collect()
    // with no target docs, every lp_t is ln(1/v) — defined, not NaN
    assert(s.map(_._1).toSet == Set(3L) && !s.head._3.isNaN)
  }

  test("sample: deterministic, contained in scores, exhaustive at k=all") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        (col("doc_id") % 11 === 0).as("tgt"))
    def draw(k: Int) =
      Dsir.sample(docs, col("doc_id"), col("text"), col("tgt"), k)
        .as[(Long, Double)].collect().toSeq
    val d1 = draw(25)
    assert(d1 == draw(25) && d1.size == 25)             // bit-reproducible
    // skey recomputes from the published scores + the Lehmer Gumbel
    val avg = Dsir.scores(docs, col("doc_id"), col("text"), col("tgt"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    d1.foreach { case (id, skey) =>
      val u = ((id % 2147483647L) * 48271L % 2147483647L % 1000000L + 0.5) / 1000000.0
      // Spark SQL log() is Math.log (only the driver-side model uses
      // StrictMath) — replicate exactly
      val expect = math.floor(
        (avg(id) - math.log(-math.log(u))) * 1e6 + 0.5) / 1e6
      assert(skey == expect, s"doc $id")
    }
    // k >= corpus size returns every scoreable doc
    assert(draw(1000).map(_._1).toSet == avg.keySet)
  }
}
