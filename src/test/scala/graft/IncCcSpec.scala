package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Incremental connected components over persisted labels: quotient
  * merges, new nodes, redundant edges, untouched passthrough, and
  * exact parity with a from-scratch re-solve. */
class IncCcSpec extends SparkSpec {
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)]) =
    ConnectedComponents.run(edges.toDF("src", "dst"))

  test("merges, new nodes, and redundant edges land on min-id labels") {
    // base: {1,2} and {3,4} and {7,8}; batch merges the first two,
    // re-asserts a known edge (no-op), and adds a fresh pair {9,10}
    val base = labels(Seq((1L, 2L), (3L, 4L), (7L, 8L)))
    val batch = Seq((2L, 3L), (1L, 2L), (9L, 10L)).toDF("src", "dst")
    val got = ConnectedComponents.increment(base, batch)
      .as[(Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), // merged under min id 1
      (7L, 7L), (8L, 7L),                     // untouched passthrough
      (9L, 9L), (10L, 9L)))                   // brand-new component
  }

  test("a new node bridging two components pulls both under the global min") {
    val base = labels(Seq((5L, 6L), (2L, 3L)))
    val batch = Seq((100L, 5L), (100L, 2L)).toDF("src", "dst")
    val got = ConnectedComponents.increment(base, batch)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 2L), (3L, 2L), (5L, 2L), (6L, 2L), (100L, 2L)))
  }

  test("exact parity with a from-scratch re-solve on a pseudo-random graph") {
    val baseE = (0L until 300L).map(i => (i % 61, (i * 13 + 7) % 61))
    val batchE = (0L until 80L).map(i => (i % 61, 200 + i % 9))
    val got = ConnectedComponents.increment(
        labels(baseE), batchE.toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    val want = ConnectedComponents.run((baseE ++ batchE).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(got == want)
    // determinism
    val again = ConnectedComponents.increment(
        labels(baseE), batchE.toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(again == got)
  }
}
