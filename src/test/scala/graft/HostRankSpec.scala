package graft

import org.apache.spark.sql.functions._

import graft.operators.HostRank

/** Integer fixed-point PageRank: hand-computed ranks, self-loop and
  * multi-edge handling, dangling mass, mass conservation, and exact
  * parity with a driver-side reference implementation. */
class HostRankSpec extends SparkSpec {
  import spark.implicits._

  test("one iteration matches the hand-computed recurrence incl. dangling mass") {
    // 1 -> 2 -> 3, node 3 dangling; scale 1000, damping 85, N=3
    // base = 150; D = 1000, D div 3 = 333
    // r1(1) = 150 + (85*333) div 100            = 433
    // r1(2) = 150 + (85*(1000+333)) div 100     = 1283  (= r1(3))
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = HostRank.pageRank(e, iters = 1, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 433L, 2L -> 1283L, 3L -> 1283L))
  }

  test("self-loops drop, multi-edges collapse, a symmetric cycle holds at scale") {
    val e = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = HostRank.pageRank(e, iters = 2).as[(Long, Long)].collect().toMap
    // after cleanup the graph is the 2-cycle: every node passes its
    // whole rank on, no dangling — ranks sit at the fixpoint `scale`
    assert(got == Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("a shared target outranks its sources") {
    val e = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = HostRank.pageRank(e, iters = 3).as[(Long, Long)].collect().toMap
    assert(got(3L) > got(1L) && got(1L) == got(2L))
  }

  test("exact parity with a driver-side reference on a pseudo-random graph") {
    val edges = (0L until 200L).flatMap { i =>
      Seq((i % 29, (i * 37 + 11) % 29), (i % 29, 30 + i % 5))
    }
    val df = edges.toDF("src", "dst")
    val got = HostRank.pageRank(df, iters = 3).as[(Long, Long)].collect().toMap

    // reference: same integer recurrence, plain Scala
    val e = edges.filter { case (s0, d0) => s0 != d0 }.distinct
    val nodes = e.flatMap { case (s0, d0) => Seq(s0, d0) }.distinct.sorted
    val odeg = e.groupBy(_._1).map { case (s0, es) => (s0, es.size.toLong) }
    val n = nodes.size.toLong
    val scale = 1000000000L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to 3) {
      val dmass = nodes.filterNot(odeg.contains).map(r).sum
      val in = e.groupBy(_._2).map { case (d0, es) =>
        (d0, es.map { case (s0, _) => r(s0) / odeg(s0) }.sum)
      }
      r = nodes.map(v =>
        v -> (150000000L + (85L * (in.getOrElse(v, 0L) + dmass / n)) / 100L)).toMap
    }
    assert(got == r)
    // mass conservation: truncation only ever loses, never creates
    val total = got.values.sum
    assert(total <= n * scale && total > n * scale - n * 200L)
  }

  test("a scale that could wrap 64-bit damping arithmetic fails fast") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val err = intercept[IllegalArgumentException] {
      HostRank.pageRank(e, iters = 1, scale = Long.MaxValue / 150L)
    }
    assert(err.getMessage.contains("2^63"))
  }

  test("warm refresh: exact semantics (j steps from the seed) and faster convergence") {
    // previous cycle's graph + a small crawl delta (new hosts 100..104
    // linking into the old graph, one new cross edge). The base is
    // SKEWED (53 sources funneling into 23 targets) so its ranks are
    // genuinely non-uniform — on a regular graph the fixpoint is the
    // uniform init and a warm seed would be indistinguishable from cold
    val base = (0L until 400L).map(i => (i % 53, (i * 17 + 3) % 23))
    val delta = (0L until 5L).map(i => (100L + i, i % 37)) :+ (5L, 31L)
    val baseDf = base.toDF("src", "dst")
    val fullDf = (base ++ delta).toDF("src", "dst")
    val prev = HostRank.pageRank(baseDf, iters = 10)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap

    // exact declared semantics: refresh(j) == j recurrence steps from
    // the warm seed — pinned against a driver-side replay
    val got = m(HostRank.refresh(fullDf, prev, iters = 2))
    val seed = m(prev)
    val e = (base ++ delta).filter { case (s0, d0) => s0 != d0 }.distinct
    val nodes = e.flatMap { case (s0, d0) => Seq(s0, d0) }.distinct.sorted
    val odeg = e.groupBy(_._1).map { case (s0, es) => (s0, es.size.toLong) }
    val n = nodes.size.toLong
    val scale = 1000000000L
    var r = nodes.map(v => v -> seed.getOrElse(v, scale)).toMap
    for (_ <- 1 to 2) {
      val dmass = nodes.filterNot(odeg.contains).map(r).sum
      val in = e.groupBy(_._2).map { case (d0, es) =>
        (d0, es.map { case (s0, _) => r(s0) / odeg(s0) }.sum)
      }
      r = nodes.map(v =>
        v -> (150000000L + (85L * (in.getOrElse(v, 0L) + dmass / n)) / 100L)).toMap
    }
    assert(got == r)

    // convergence value: warm-2 lands closer to the converged full-run
    // ranks than cold-2 (the refresh-cycle payoff for a small delta)
    val converged = m(HostRank.pageRank(fullDf, iters = 25))
    val cold2 = m(HostRank.pageRank(fullDf, iters = 2))
    def l1(a: Map[Long, Long]) =
      converged.map { case (k, v) => math.abs(a(k) - v) }.sum
    assert(l1(got) < l1(cold2),
      s"warm ${l1(got)} should beat cold ${l1(cold2)}")
  }

  test("bit-determinism across runs") {
    val e = (0L until 500L).map(i => (i % 41, (i * 13 + 7) % 41)).toDF("src", "dst")
    val a = HostRank.pageRank(e, iters = 3).as[(Long, Long)].collect().toSet
    val b = HostRank.pageRank(e, iters = 3).as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
