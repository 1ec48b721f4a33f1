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

  test("temperature alpha=1 keeps the natural mixture (every rate == budget fraction)") {
    import spark.implicits._
    val df = Seq((1L, "a", 100L), (2L, "a", 100L), (3L, "b", 800L))
      .toDF("id", "dom", "tk")
    // alpha=1: weights proportional to capacity -> rate = bf everywhere
    // (proportional allocation never caps)
    val r = Mixture.rates(Map("a" -> 200L, "b" -> 800L),
      Map("a" -> 200.0, "b" -> 800.0), budget = 500.0)
    assert(math.abs(r("a") - 0.5) < 1e-12 && math.abs(r("b") - 0.5) < 1e-12)
    val kept = Mixture.temperatureSample(df, col("id"), col("dom"), col("tk"),
      alpha = 1.0, budgetFraction = 1.0).count()
    assert(kept == 3L, "bf=1 at alpha=1 must keep everything")
  }

  test("temperature alpha<1 boosts low-resource domains; capping re-flows") {
    // capacities 100 vs 10000; sqrt weights 10 vs 100 -> the small
    // domain's allocation (budget*10/110) exceeds its relative share
    val r = {
      val t = Map("small" -> 100L, "big" -> 10000L)
      Mixture.rates(t, t.map { case (d, c) => d -> math.sqrt(c.toDouble) },
        budget = 1100.0)
    }
    // small: 1100*10/110 = 100 = capacity -> pins to 1, surplus 0
    assert(r("small") === 1.0)
    // big gets the remaining 1000 of 10000 -> 0.1
    assert(math.abs(r("big") - 0.1) < 1e-12)
    // natural mixture would have given small only 1100*100/10100 ~ 10.9
    // tokens (rate ~0.109): alpha=0.5 boosted it ~9x
  }

  test("temperatureSample on real docs: flattened rates order inversely with domain mass") {
    val docs = Tables.documents(spark, sfDir)
    val out = Mixture.temperatureSample(docs, col("doc_id"), col("source"),
      col("n_chars"), alpha = 0.5, budgetFraction = 0.35)
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = docs.groupBy("source").agg(sum("n_chars").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the computed keep-rates themselves must be anti-monotone in
    // capacity across the extremes (sampling noise-free check)
    val r = Mixture.rates(tot,
      tot.map { case (d, c) => d -> math.sqrt(c.toDouble) },
      0.35 * tot.values.map(_.toDouble).sum)
    val sorted = tot.toSeq.sortBy(_._2)
    val loDom = sorted.head._1; val hiDom = sorted.last._1
    assert(r(loDom) >= r(hiDom),
      s"low-resource $loDom rate ${r(loDom)} < $hiDom ${r(hiDom)}")
    assert(out.count() > 0 && kept.nonEmpty)
  }
}
