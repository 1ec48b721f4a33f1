package graft

import org.apache.spark.sql.functions._

import graft.text.Bm25

/** [[graft.text.Bm25]] — scores vs a string-grain brute-force replica
  * (same idf, same decimal(,8) sum, same rounding), ranking
  * determinism, and the two-phase top-k's exactness. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val k1 = 1.2
  private val b = 0.75

  /** Brute BM25 over in-memory strings through the identical numeric
    * contract: IEEE per-term scores, BigDecimal-scale-8 HALF_UP sum,
    * croundD(6) output. */
  private def brute(docs: Seq[(Long, String)], queries: Seq[(Int, String)],
                    k: Int): Seq[(Int, Long, Long, Double, Int)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = docs.size.toLong
    val sumDl = toks.valuesIterator.map(_.size.toLong).sum
    val avgdl = sumDl.toDouble / n.toDouble
    val qTerms = queries.map { case (qid, q) =>
      qid -> q.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq }
    val dfreq = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }
    qTerms.flatMap { case (qid, terms) =>
      val perDoc = docs.flatMap { case (id, _) =>
        val tk = toks(id)
        val dl = tk.size.toDouble
        val hits = terms.filter(t => tk.contains(t))
        if (hits.isEmpty) None
        else {
          val score = hits.map { t =>
            val tf = tk.count(_ == t).toDouble
            val idf = StrictMath.log(1.0 + (n - dfreq(t) + 0.5) / (dfreq(t) + 0.5))
            val s = idf * tf * (k1 + 1.0) /
              (tf + k1 * (1.0 - b + b * dl / avgdl))
            new java.math.BigDecimal(java.lang.Double.toString(s))
              .setScale(8, java.math.RoundingMode.HALF_UP)
          }.reduce(_.add(_)).doubleValue()
          Some((id, hits.size.toLong, score))
        }
      }
      perDoc.sortBy { case (id, _, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, nt, s), i) =>
          (qid, id, nt, graft.functions.Numeric.croundD(s, 6), i + 1) }
    }
  }

  private val docs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "quick brown foxes are quick and quick again",
    3L -> "a lazy dog sleeps all day in the sun",
    4L -> "brown bread and brown butter on the table",
    5L -> "the dog chases the fox over the brown hill",
    6L -> "nothing relevant here at all just filler words")

  private val queries = Seq(1 -> "quick brown fox", 2 -> "lazy dog")

  private def run(k: Int) =
    Bm25.topK(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        queries, k = k, k1 = k1, b = b)
      .as[(Int, Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._5))

  test("matches the brute-force replica, scores and ranks") {
    assert(run(4) === brute(docs, queries, 4))
  }

  test("k past the candidate count returns every matching doc once") {
    val got = run(100)
    assert(got === brute(docs, queries, 100))
    // query 1 matches docs 1,2,4,5 (no 'quick|brown|fox' in 3,6)
    assert(got.filter(_._1 == 1).map(_._2).sorted === Seq(1L, 2L, 4L, 5L))
    // ranks are 1..n dense per query
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._5).sorted === (1 to rows.size))
    }
  }

  test("repeated query terms score once; no-hit queries emit nothing") {
    val q = Seq(7 -> "quick quick quick", 8 -> "zebra quantum")
    val got = Bm25.topK(docs.toDF("doc_id", "text"), col("doc_id"),
        col("text"), q, k = 3)
      .as[(Int, Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._5))
    assert(got === brute(docs, q, 3))
    assert(got.forall(_._1 == 7))
    assert(got.filter(_._1 == 7).map(_._3).forall(_ == 1L))
  }

  test("two-phase pruning is exact under forced multi-partition input") {
    val wide = (1L to 200L).map(i =>
      i -> s"term$i common ${"pad " * (i % 7).toInt}common")
    val df = wide.toDF("doc_id", "text").repartition(8)
    val got = Bm25.topK(df, col("doc_id"), col("text"),
        Seq(1 -> "common"), k = 5)
      .as[(Int, Long, Long, Double, Int)].collect().toSeq.sortBy(_._5)
    assert(got === brute(wide, Seq(1 -> "common"), 5))
  }
}
