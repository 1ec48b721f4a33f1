package graft

import org.apache.spark.sql.functions._
import graft.operators.EditJoin

class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(a: Seq[(Long, String)], b: Seq[(Long, String)], d: Int) = {
    def lev(s: String, t: String): Int = {
      val m = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to s.length; j <- 1 to t.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      m(s.length)(t.length)
    }
    (for {
      (ai, an) <- a; if an.length >= d + 1
      (bi, bn) <- b
      dist = lev(an, bn) if dist <= d
    } yield (ai, bi, dist)).toSet
  }

  private def run(a: Seq[(Long, String)], b: Seq[(Long, String)], d: Int) =
    EditJoin.pairs(a.toDF("id", "n"), col("id"), col("n"),
        b.toDF("id", "n"), col("id"), col("n"), d)
      .as[(Long, Long, Int)].collect().toSet

  test("segment bounds partition the length") {
    assert(EditJoin.segments(10, 3) == Seq((0, 4), (4, 3), (7, 3)))
    assert(EditJoin.segments(9, 3) == Seq((0, 3), (3, 3), (6, 3)))
    assert(EditJoin.segments(2, 2) == Seq((0, 1), (1, 1)))
  }

  test("hand cases at d=1: substitution, deletion, insertion, miss") {
    val a = Seq(1L -> "spark", 2L -> "graft")
    val b = Seq(10L -> "spork",   // substitution
      11L -> "spak",              // deletion
      12L -> "sparkk",            // insertion
      13L -> "spoon")             // distance > 1
    assert(run(a, b, 1) == Set((1L, 10L, 1), (1L, 11L, 1), (1L, 12L, 1)))
  }

  test("random corpus equals brute force at d=1 and d=2") {
    val rnd = new scala.util.Random(42)
    def word() = (0 until (4 + rnd.nextInt(8)))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString // small alphabet -> collisions
    val a = (1L to 120L).map(i => i -> word())
    val b = (1001L to 1120L).map(i => i -> word())
    (1 to 2).foreach { d =>
      val want = brute(a, b, d)
      val got = run(a, b, d)
      assert(got == want, s"d=$d: ${got.size} vs brute ${want.size}; " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("identical strings pair at distance 0; no cartesian in the plan") {
    val a = Seq(1L -> "hello")
    assert(run(a, Seq(2L -> "hello"), 1) == Set((1L, 2L, 0)))
    val plan = EditJoin.pairs(
      spark.range(100).select(col("id"), concat(lit("name"), col("id")).as("n")),
      col("id"), col("n"),
      spark.range(100).select(col("id"), concat(lit("name"), col("id")).as("n")),
      col("id"), col("n"), 1).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking must avoid all-pairs:\n${plan.take(900)}")
  }
}
