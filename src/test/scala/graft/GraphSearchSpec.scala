package graft

import org.apache.spark.sql.functions._

import graft.vector.{GraphSearch, IndexStore, NnDescent, Similarity}

class GraphSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("output shape: k ranked rows per query, no self-matches") {
    val g = NnDescent.build(emb, 10, maxRounds = 4).cache()
    val queries = emb.filter(col("vec_id") < 8)
    val r = GraphSearch.topK(g, emb, queries, k = 5, beam = 16).cache()
    assert(r.count() == 8 * 5)
    assert(r.filter(col("q_id") === col("n_id")).count() == 0)
    val ranks = r.groupBy("q_id")
      .agg(sort_array(collect_list("rank")).as("rs"))
      .select("rs").distinct().as[Seq[Int]].collect()
    assert(ranks.toSeq == Seq(1 to 5))
    r.unpersist(); g.unpersist()
  }

  test("search is bit-deterministic") {
    val g = NnDescent.build(emb, 8, maxRounds = 3).cache()
    val queries = emb.filter(col("vec_id") < 5)
    val a = GraphSearch.topK(g, emb, queries, k = 4, beam = 12)
      .collect().map(_.toString).sorted.toSeq
    val b = GraphSearch.topK(g, emb, queries, k = 4, beam = 12)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    g.unpersist()
  }

  test("sims are the exact cosine and ranks descend") {
    val g = NnDescent.build(emb, 8, maxRounds = 3).cache()
    val queries = emb.filter(col("vec_id") < 5)
    val r = GraphSearch.topK(g, emb, queries, k = 5, beam = 12).cache()
    // exact-cosine replay for the emitted (q_id, n_id) pairs
    val v = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    val replay = r.join(v.select(col("vec_id").as("q_id"),
        col("embedding").as("qe"), col("nrm").as("qn")), Seq("q_id"))
      .join(v.select(col("vec_id").as("n_id"),
        col("embedding").as("ne"), col("nrm").as("nn")), Seq("n_id"))
      .withColumn("want",
        Similarity.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
    assert(replay.filter(col("sim") =!= col("want")).count() == 0)
    val nonDesc = r.as("a").join(r.as("b"),
      col("a.q_id") === col("b.q_id") && col("a.rank") === col("b.rank") - 1
        && col("a.sim") < col("b.sim"))
    assert(nonDesc.count() == 0)
    r.unpersist(); g.unpersist()
  }

  test("recall@10 against brute force at the registry configuration") {
    val g = NnDescent.build(emb, 10, maxRounds = 6, convergedFrac = 0.01)
      .cache()
    val queries = emb.filter(col("vec_id") < 10)
    val r = GraphSearch.topK(g, emb, queries, k = 10, beam = 30)
    val brute = Similarity.bruteTopK(emb, queries, 10)
    val hits = r.select("q_id", "n_id")
      .join(brute.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val recall = hits.toDouble / brute.count()
    assert(recall >= 0.9, s"recall $recall < 0.9")
    g.unpersist()
  }

  test("hierarchical entries cut hops at equal recall on the same graph") {
    val g = NnDescent.build(emb, 10, maxRounds = 6, convergedFrac = 0.01)
      .cache()
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteTopK(emb, queries, 10).cache()
    val total = brute.count()
    def recall(r: org.apache.spark.sql.DataFrame): Double =
      r.select("q_id", "n_id")
        .join(brute.select("q_id", "n_id"), Seq("q_id", "n_id"))
        .count().toDouble / total
    // "fewer hops at equal recall": the smallest hop budget reaching
    // recall 0.9 (the registry floor) must be strictly smaller with
    // hierarchical entries; the walks are bit-deterministic, so these
    // are exact measurements, not flaky thresholds. Measured series
    // (budget: flat/hier recall): 1: 0.45/0.68, 2: 0.87/0.94,
    // 3: 0.98/0.98 — entries starting near the query are worth one
    // full hop of the beam walk on this corpus.
    def flatAt(b: Int) = recall(GraphSearch.topKWithHops(g, emb, queries,
      k = 10, beam = 30, maxHops = b)._1)
    def hierAt(b: Int) = recall(GraphSearch.topKHierWithHops(g, emb,
      queries, k = 10, beam = 30, fanout = 8, maxHops = b)._1)
    val needFlat = (1 to 8).find(flatAt(_) >= 0.9).get
    val needHier = (1 to 8).find(hierAt(_) >= 0.9).get
    info(s"hops to recall>=0.9: flat $needFlat, hier $needHier")
    assert(needHier < needFlat,
      s"hier needs $needHier hops, not below flat's $needFlat")
    // and at the tightest budget the entry advantage is large
    val (f1, h1) = (flatAt(1), hierAt(1))
    info(s"budget-1 recall: flat $f1, hier $h1")
    assert(h1 > f1, s"hier budget-1 recall $h1 not above flat $f1")
    brute.unpersist(); g.unpersist()
  }

  test("hier is bit-deterministic; an empty layer falls back to the flat entries") {
    val g = NnDescent.build(emb, 8, maxRounds = 3).cache()
    val queries = emb.filter(col("vec_id") < 5)
    val a = GraphSearch.topKHier(g, emb, queries, k = 4, beam = 12, fanout = 8)
      .collect().map(_.toString).sorted.toSeq
    val b = GraphSearch.topKHier(g, emb, queries, k = 4, beam = 12, fanout = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // a fanout no node hashes to 0 under leaves the layer empty: the
    // search must degrade to exactly the flat-entry walk
    val fallback = GraphSearch.topKHier(g, emb, queries, k = 4, beam = 12,
        fanout = Int.MaxValue)
      .collect().map(_.toString).sorted.toSeq
    val flat = GraphSearch.topK(g, emb, queries, k = 4, beam = 12)
      .collect().map(_.toString).sorted.toSeq
    assert(fallback == flat)
    g.unpersist()
  }

  test("serving from the persisted index equals serving the fresh graph") {
    val dir = "/tmp/graft_gsearch_spec_idx"
    val g = NnDescent.build(emb, 6, maxRounds = 3).cache()
    IndexStore.saveKnn(dir, g, 6)
    val (loaded, k) = IndexStore.loadKnn(spark, dir)
    assert(k == 6)
    val queries = emb.filter(col("vec_id") < 5)
    val fresh = GraphSearch.topK(g, emb, queries, k = 4, beam = 10)
      .collect().map(_.toString).sorted.toSeq
    val served = GraphSearch.topK(loaded, emb, queries, k = 4, beam = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(served == fresh)
    g.unpersist()
  }
}
