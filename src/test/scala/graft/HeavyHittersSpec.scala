package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Sketch-then-verify heavy hitters vs the naive exact groupBy. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(items: Seq[String], num: Long, den: Long): Set[(String, Long)] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * den >= n * num }.toSeq.map(x => (x._1, x._2)).toSet
  }

  test("equals the exact threshold set on skewed synthetic data") {
    val rnd = new scala.util.Random(13)
    // zipf-ish: a few hot items over a long tail of near-uniques
    val items = (0 until 20000).map { i =>
      val r = rnd.nextDouble()
      if (r < 0.10) "hot1" else if (r < 0.17) "hot2" else if (r < 0.215) "hot3"
      else if (r < 0.23) "warm" else s"tail_${rnd.nextInt(5000)}"
    }
    val df = items.toDF("item")
    for ((num, den, k) <- Seq((1L, 20L, 64), (1L, 50L, 128), (3L, 100L, 64))) {
      val got = HeavyHitters.frequentItems(df, col("item"), num, den, k)
        .as[(String, Long)].collect().toSet
      assert(got === exact(items, num, den), s"threshold $num/$den k=$k")
    }
  }

  test("guarantee precondition is enforced") {
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(Seq("a").toDF("item"), col("item"), 1L, 100L, 50)
    }
  }

  test("no qualifying items yields an empty frame") {
    val df = (0 until 1000).map(i => s"u$i").toDF("item")
    assert(HeavyHitters.frequentItems(df, col("item"), 1L, 10L, 64).count() == 0L)
  }
}
