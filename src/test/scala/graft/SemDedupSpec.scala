package graft

import org.apache.spark.sql.functions._

import graft.vector.{SemDedup, Similarity}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated semantic groups plus two isolated vectors;
  // within-group cosine ~1, cross-group ~0
  private def vecs = Seq(
    (1L, Array(1.0f, 0.02f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.0f, 0.01f, 0.0f)),
    (3L, Array(1.0f, 0.01f, 0.01f, 0.0f)),
    (10L, Array(0.0f, 0.0f, 1.0f, 0.03f)),
    (11L, Array(0.0f, 0.02f, 0.98f, 0.0f)),
    (20L, Array(0.7f, 0.0f, 0.7f, 0.1f)),
    (21L, Array(0.0f, 1.0f, 0.0f, 0.6f))
  ).toDF("vec_id", "embedding")

  test("keep-list keeps the min id of each semantic group") {
    val kept = SemDedup.keepList(vecs, nlist = 2, threshold = 0.95)
      .filter(col("keep") === 1).select("vec_id").as[Long].collect().toSet
    // groups {1,2,3} and {10,11} collapse; 20 and 21 are their own
    assert(kept === Set(1L, 10L, 20L, 21L))
  }

  test("nprobe=nlist equals the brute-force pair set") {
    // probing every cell degrades gracefully to the exact result,
    // mirroring IVF's nprobe = nlist contract
    val got = SemDedup.pairs(vecs, nlist = 2, threshold = 0.95, nprobe = 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val v = vecs.as[(Long, Array[Float])].collect()
    val want = (for {
      (i, a) <- v; (j, b) <- v if i < j
      dotp = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if dotp / (na * nb) >= 0.95
    } yield (i, j)).toSet
    assert(got === want && want.nonEmpty)
  }

  test("real embeddings: no false positives, and cells recover the planted duplicates") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = SemDedup.pairs(emb, nlist = 4, threshold = 0.4, nprobe = 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val v = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val exact = (for {
      (i, a) <- v; (j, b) <- v if i < j
      dotp = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if dotp / (na * nb) >= 0.4
    } yield (i, j)).toSet
    // within-cell cosine is exact, so false positives are impossible
    assert((got -- exact).isEmpty)
    // the declared approximation is cross-cell misses only; the
    // planted duplicate pairs overwhelmingly share a cell
    assert(exact.nonEmpty &&
      got.size.toDouble / exact.size >= 0.8,
      s"recall ${got.size}/${exact.size}")
  }
}
