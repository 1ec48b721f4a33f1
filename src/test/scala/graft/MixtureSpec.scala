package graft

import org.apache.spark.sql.functions._

import graft.text.Mixture

/** [[graft.text.Mixture]] — water-filling rates and the sampled
  * mixture's determinism/containment. */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("uncapped budget splits by normalized weight") {
    val r = Mixture.rates(
      Map("a" -> 100L, "b" -> 100L), Map("a" -> 3.0, "b" -> 1.0), budget = 80)
    assert(r("a") === 0.6)  // 80 * 0.75 / 100
    assert(r("b") === 0.2)  // 80 * 0.25 / 100
  }

  test("capped domain pins to 1 and its surplus re-flows by weight") {
    val r = Mixture.rates(
      Map("a" -> 10L, "b" -> 100L, "c" -> 100L),
      Map("a" -> 0.8, "b" -> 0.1, "c" -> 0.1), budget = 60)
    // round 1: a alloc 48 >= 10 -> rate 1, 50 left for b,c at w 0.5/0.5
    assert(r === Map("a" -> 1.0, "b" -> 0.25, "c" -> 0.25))
  }

  test("budget above total capacity keeps everything; zero keeps nothing") {
    val t = Map("a" -> 10L, "b" -> 20L)
    val w = Map("a" -> 1.0, "b" -> 1.0)
    assert(Mixture.rates(t, w, 1000) === Map("a" -> 1.0, "b" -> 1.0))
    assert(Mixture.rates(t, w, 0) === Map("a" -> 0.0, "b" -> 0.0))
  }

  test("unweighted and zero-capacity domains are dropped") {
    val r = Mixture.rates(
      Map("a" -> 100L, "ghost" -> 0L, "unlisted" -> 50L),
      Map("a" -> 1.0, "ghost" -> 5.0), budget = 50)
    assert(r("a") === 0.5 && r("ghost") === 0.0 && r("unlisted") === 0.0)
  }

  test("sample is deterministic, contained, and respects rate-0 domains") {
    val docs = Tables.documents(spark, sfDir)
    val weights = (0 until 5).map(i => s"src$i" -> 3.0).toMap ++
      (5 until 20).map(i => s"src$i" -> 1.0).toMap - "src19"
    val s1 = Mixture.sample(docs, col("doc_id"), col("source"), col("n_chars"),
      weights, 0.35)
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Mixture.sample(docs, col("doc_id"), col("source"), col("n_chars"),
        weights, 0.35)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2 && ids1.nonEmpty)
    assert(s1.filter(col("source") === "src19").count() === 0)
    // weighted sources keep a visibly larger share than unit sources
    val kept = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hi = (0 until 5).map(i => kept.getOrElse(s"src$i", 0L)).sum / 5.0
    val lo = (5 until 19).map(i => kept.getOrElse(s"src$i", 0L)).sum / 14.0
    assert(hi > lo * 2, s"hi=$hi lo=$lo")
  }
}
