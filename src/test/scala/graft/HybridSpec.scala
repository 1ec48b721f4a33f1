package graft

import org.apache.spark.sql.functions._

import graft.text.Hybrid

class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("RRF fuses by summed reciprocal ranks, hand-computed") {
    // system A ranks (q1: d10, d20); system B ranks (q1: d20, d30)
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val r = Hybrid.rrf(Seq(a, b), k = 10, k0 = 60)
      .orderBy("rank").collect()
    // d20: 1/62 + 1/61 = 0.032524...; d10: 1/61 = 0.016393; d30: 1/62
    assert(r.map(_.getLong(1)).toSeq == Seq(20L, 10L, 30L))
    assert(math.abs(r(0).getDouble(2) - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    assert(math.abs(r(1).getDouble(2) - 1.0 / 61) < 1e-6)
    assert(r.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
  }

  test("a doc missing from one system only sums the systems that ranked it") {
    val a = Seq((1L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 99L, 1)).toDF("query_id", "doc_id", "rank")
    val r = Hybrid.rrf(Seq(a, b), k = 10).collect()
    assert(r.length == 2)
    // identical scores 1/61 -> tie broken by doc_id
    assert(r.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq == Seq(10L, 99L))
  }

  test("per-query top-k cut and query isolation") {
    val a = (1 to 30).map(i => (1L, i.toLong, i)) ++
      (1 to 3).map(i => (2L, (100 + i).toLong, i))
    val r = Hybrid.rrf(Seq(a.toDF("query_id", "doc_id", "rank")), k = 5)
    val counts = r.groupBy("query_id").count().as[(Long, Long)]
      .collect().toMap
    assert(counts == Map(1L -> 5L, 2L -> 3L))
  }
}
