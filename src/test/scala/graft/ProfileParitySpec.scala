package graft

import org.apache.spark.sql.functions._

import graft.operators.HostRank
import graft.vector.{GraphSearch, NnDescent}

/** r17 pins for the dual execution profiles of the iterative
  * operators: the size-gated narrowed-session loop (small inputs) and
  * the caller-width loop (large inputs) must produce BIT-IDENTICAL
  * results — the gate is a physical-execution knob only. Each test
  * runs the same small input through both profiles by overriding the
  * gate, and compares exact row sets. */
class ProfileParitySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) = (0 until n).map { i =>
    (i.toLong, Array.tabulate(8)(j =>
      (((i * 31 + j * 17) % 97) / 97.0f) - 0.5f))
  }.toDF("vec_id", "embedding")

  test("NnDescent.build: narrow and wide profiles are bit-identical") {
    val v = vecs(120)
    val narrow = NnDescent.build(v, k = 4, maxRounds = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val wide = NnDescent.build(v, k = 4, maxRounds = 3, narrowCap = 0L)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(wide == narrow)
    assert(narrow.nonEmpty)
  }

  test("GraphSearch.topK: local, narrow and wide profiles are " +
    "bit-identical") {
    val v = vecs(120)
    val g = NnDescent.build(v, k = 4, maxRounds = 3)
    val q = v.filter(col("vec_id") < 5)
    val local = GraphSearch.topK(g, v, q, k = 3, beam = 6)
      .as[(Long, Int, Long, Double)].collect().toSet
    val narrow = GraphSearch.topK(g, v, q, k = 3, beam = 6, driverCap = 0L)
      .as[(Long, Int, Long, Double)].collect().toSet
    val wide = GraphSearch.topK(g, v, q, k = 3, beam = 6, narrowCap = 0L,
        driverCap = 0L)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(narrow == local)
    assert(wide == local)
    assert(local.nonEmpty)
  }

  test("GraphSearch.topKHier: local and distributed profiles are " +
    "bit-identical (incl. the tiny-corpus fallback)") {
    val v = vecs(120)
    val g = NnDescent.build(v, k = 4, maxRounds = 3)
    val q = v.filter(col("vec_id") < 5)
    val local = GraphSearch.topKHier(g, v, q, k = 3, beam = 6)
      .as[(Long, Int, Long, Double)].collect().toSet
    val wide = GraphSearch.topKHier(g, v, q, k = 3, beam = 6,
        narrowCap = 0L, driverCap = 0L)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(wide == local)
    assert(local.nonEmpty)
  }

  test("GraphSearch.topKLayered: local and distributed profiles are " +
    "bit-identical (seeded descent walks)") {
    val v = vecs(240)
    val g = NnDescent.build(v, k = 4, maxRounds = 3)
    val layers = GraphSearch.buildLayers(v, k = 3, fanout = 4, levels = 1)
    assume(layers.nonEmpty)
    val q = v.filter(col("vec_id") < 5)
    val local = GraphSearch.topKLayered(g, layers, v, q, k = 3, beam = 6,
        fanout = 4)
      .as[(Long, Int, Long, Double)].collect().toSet
    val wide = GraphSearch.topKLayered(g, layers, v, q, k = 3, beam = 6,
        fanout = 4, narrowCap = 0L, driverCap = 0L)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(wide == local)
    assert(local.nonEmpty)
  }

  test("HostRank.pageRank: local, narrow and wide profiles are " +
    "bit-identical") {
    val edges = (0 until 400).map(i =>
      ((i % 37).toLong, ((i * 13 + 5) % 37).toLong)).toDF("src", "dst")
    val local = HostRank.pageRank(edges, iters = 3)
      .as[(Long, Long)].collect().toSet
    val narrow = HostRank.pageRank(edges, iters = 3, driverCap = 0L)
      .as[(Long, Long)].collect().toSet
    val wide = HostRank.pageRank(edges, iters = 3, narrowCap = 0L,
        driverCap = 0L)
      .as[(Long, Long)].collect().toSet
    assert(narrow == local)
    assert(wide == local)
    assert(local.nonEmpty)
  }

  test("HostRank.refresh: local and distributed profiles are " +
    "bit-identical (warm seed collected)") {
    val base = (0 until 300).map(i =>
      ((i % 29).toLong, ((i * 11 + 3) % 29).toLong)).toDF("src", "dst")
    val full = (0 until 400).map(i =>
      ((i % 37).toLong, ((i * 13 + 5) % 37).toLong)).toDF("src", "dst")
    val prev = HostRank.pageRank(base, iters = 3)
    val local = HostRank.refresh(full, prev, iters = 2)
      .as[(Long, Long)].collect().toSet
    val wide = HostRank.refresh(full, prev, iters = 2, narrowCap = 0L,
        driverCap = 0L)
      .as[(Long, Long)].collect().toSet
    assert(wide == local)
    assert(local.nonEmpty)
  }
}
