package graft

import graft.multimodal.{Binary, ImageDedup, Texture}
import graft.dedup.SimHashDedup
import org.apache.spark.sql.functions._

/** Perceptual image hashing + banded-Hamming image dedup. */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def randomImage(seed: Long, w: Int, h: Int): Array[Double] = {
    val rng = new scala.util.Random(seed)
    Array.fill(w * h)(rng.nextDouble() * 255.0)
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("phash and dhash are invariant to positive affine brightness changes") {
    val px = randomImage(7, 16, 16)
    val bright = px.map(v => v * 1.5 + 40.0)
    assert(Texture.phash64(px, 16, 16) == Texture.phash64(bright, 16, 16))
    assert(Texture.dhash64(px, 16, 16) == Texture.dhash64(bright, 16, 16))
  }

  test("phash: small perturbations stay close, unrelated images are far") {
    val px = randomImage(11, 32, 32)
    val tweaked = px.clone()
    var i = 0
    while (i < tweaked.length) { tweaked(i) += math.sin(i) * 2.0; i += 1 }
    val h0 = Texture.phash64(px, 32, 32)
    assert(ham(h0, Texture.phash64(tweaked, 32, 32)) <= 8,
      "low-amplitude noise must not move many hash bits")
    val other = randomImage(99, 32, 32)
    assert(ham(h0, Texture.phash64(other, 32, 32)) > 16,
      "independent images should differ on ~half the AC signs")
  }

  test("phash DC bit is reserved and the hash is 63-bit") {
    val px = randomImage(5, 8, 8)
    assert((Texture.phash64(px, 8, 8) & 1L) == 0L)
  }

  test("resampleBilinear preserves constants and the identity size") {
    val const = Array.fill(12 * 5)(7.25)
    assert(Texture.resampleBilinear(const, 12, 5, 8, 8).forall(_ == 7.25))
    val px = randomImage(3, 6, 4)
    assert(Texture.resampleBilinear(px, 6, 4, 6, 4).sameElements(px))
  }

  test("bandedHammingPairs equals brute force at its radius (64-bit fps)") {
    val rng = new scala.util.Random(42)
    val base = Array.fill(30)(rng.nextLong())
    // plant near-dups at distances 1..5 off the first few bases
    def flip(v: Long, k: Int): Long = {
      var out = v
      val bits = rng.shuffle((0 until 64).toList).take(k)
      bits.foreach(b => out ^= 1L << b)
      out
    }
    val fps = (base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      (1 to 5).map(d => (100L + d, flip(base(d), d)))).toSeq
    val maxHamming = 3
    val got = SimHashDedup.bandedHammingPairs(
        fps.toDF("doc_id", "fp"), maxHamming, bits = 64)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (i1, v1) <- fps; (i2, v2) <- fps
      if i1 < i2 && ham(v1, v2) <= maxHamming
    } yield (i1, i2, ham(v1, v2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "planted dups must be in radius")
    assert(brute.exists(_._3 > 0), "some planted pair must be non-exact")
  }

  test("image near-dup pairs surface payload duplicates at hamming 0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document body with other content words")
    ).toDF("doc_id", "text")
    val pairs = ImageDedup.nearDupPairs(spark, Binary.withPayload(docs))
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }
}
