package graft

import org.apache.spark.sql.functions._

import graft.functions.{Mix64, Numeric}
import graft.vector.RandomProjection

/** JL sign-random-projection: exact parity with a driver-side
  * reference fold, determinism, and distance preservation on the
  * real embeddings. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val outDim = 16

  private def sketch(): Map[(Long, Int), Double] =
    RandomProjection.project(Tables.embeddings(spark, sfDir),
        col("vec_id"), col("embedding"), outDim)
      .as[(Long, Int, Double)].collect()
      .map { case (v, j, p) => (v, j) -> p }.toMap

  test("exact parity with a driver-side reference") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val want = vecs.flatMap { case (vid, emb) =>
      (0 until outDim).map { j =>
        // decimal(28,8) sums replayed exactly with BigDecimal
        var acc = BigDecimal(0)
        emb.indices.foreach { i =>
          val s = 1 - 2 * (Mix64.compute(i.toLong * outDim + j) % 2)
          acc += BigDecimal(s * emb(i).toDouble)
            .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        }
        (vid, j) -> Numeric.croundD(acc.toDouble / math.sqrt(outDim.toDouble), 6)
      }
    }.toMap
    assert(sketch() == want)
  }

  test("bit-determinism across runs") {
    assert(sketch() == sketch())
  }

  test("sketch cosines track full-dimension cosines") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1).take(20)
    val sk = sketch()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val pairs = for (a <- vecs.indices; b <- a + 1 until vecs.length) yield {
      val (ia, ea) = vecs(a); val (ib, eb) = vecs(b)
      val full = cos(ea.map(_.toDouble), eb.map(_.toDouble))
      val proj = cos((0 until outDim).map(j => sk((ia, j))).toArray,
        (0 until outDim).map(j => sk((ib, j))).toArray)
      (full, proj)
    }
    val n = pairs.length.toDouble
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    val r = cov / (sx * sy)
    // deterministic (no RNG): measured 0.58 on these embeddings — the
    // synthetic vectors are near-orthogonal, so pairwise-cosine signal
    // variance is small relative to the 1/sqrt(16) JL noise; the pin
    // guards the sketch carries real geometry, not a tight JL bound
    assert(r > 0.5, s"correlation $r too low for a JL sketch")
  }
}
