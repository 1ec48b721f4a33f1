package graft

import graft.multimodal.{Binary, Texture}
import org.apache.spark.sql.functions._

/** Cooccurrence (GLCM/Haralick) + first-order texture features:
  * hand-computed matrices, degenerate images, and the frame-pipeline
  * surface. */
class TextureGlcmSpec extends SparkSpec {

  // features accumulate per-term decimal-quantized at scale 8 (the
  // order-independent cross-engine contract behind the q_glcm oracle),
  // so hand-computed expectations hold to ~64 * 5e-9
  private val eps = 1e-6

  test("glcm: hand-computed 1x4 two-level image") {
    // [0, 0, 1, 1] at 2 levels -> horizontal pairs (0,0) (0,1) (1,1),
    // symmetrized: counts (0,0)=2 (0,1)=1 (1,0)=1 (1,1)=2, total 6.
    val (con, hom, en, ent, cor) =
      Texture.glcmFeatures(Array(0.0, 0.0, 1.0, 1.0), 4, 1, levels = 2)
    assert(math.abs(con - 1.0 / 3.0) < eps)
    // 2/6 + 2/6 at d=0 plus (1/6 + 1/6)/2 at d=1
    assert(math.abs(hom - 5.0 / 6.0) < eps)
    assert(math.abs(en - 10.0 / 36.0) < eps)
    val expEnt = -(2 * (2.0 / 6) * math.log(2.0 / 6) + 2 * (1.0 / 6) * math.log(1.0 / 6))
    assert(math.abs(ent - expEnt) < eps)
    // mu = 0.5, var = 0.25, cov = 1/12 -> corr = 1/3
    assert(math.abs(cor - 1.0 / 3.0) < eps)
  }

  test("glcm: vertical pairs are counted (2x2 checker)") {
    // [[0,1],[1,0]] at 2 levels: 2 horizontal + 2 vertical pairs, all
    // cross-level -> after symmetrization p(0,1)=p(1,0)=1/2, rest 0.
    val (con, hom, en, ent, cor) =
      Texture.glcmFeatures(Array(0.0, 1.0, 1.0, 0.0), 2, 2, levels = 2)
    assert(math.abs(con - 1.0) < eps)
    assert(math.abs(hom - 0.5) < eps)
    assert(math.abs(en - 0.5) < eps)
    assert(math.abs(ent - math.log(2.0)) < eps)
    // perfectly anti-correlated neighbours
    assert(math.abs(cor - (-1.0)) < eps)
  }

  test("glcm: flat image is the identity case") {
    val (con, hom, en, ent, cor) =
      Texture.glcmFeatures(Array.fill(16)(7.5), 4, 4, levels = 8)
    assert(con == 0.0 && ent == 0.0 && cor == 0.0)
    assert(math.abs(en - 1.0) < eps)
    assert(math.abs(hom - 1.0) < eps)
  }

  test("glcm: no neighbour pairs and empty input return zeros") {
    assert(Texture.glcmFeatures(Array(3.0), 1, 1) == ((0.0, 0.0, 0.0, 0.0, 0.0)))
    assert(Texture.glcmFeatures(Array.empty[Double], 0, 0) == ((0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("glcm: max value lands in the top bin (clamp)") {
    // [0, 7] at 8 levels: bins 0 and 7 -> contrast 49, not an
    // out-of-range bin 8
    val (con, _, _, _, _) = Texture.glcmFeatures(Array(0.0, 7.0), 2, 1, levels = 8)
    assert(math.abs(con - 49.0) < eps)
  }

  test("glcm: smoother image scores lower contrast, higher homogeneity") {
    val ramp = Array.tabulate(64)(i => (i % 8).toDouble)    // gradient rows
    val noise = Array.tabulate(64)(i => if ((i + i / 8) % 2 == 0) 0.0 else 7.0) // checker
    val (cr, hr, _, _, _) = Texture.glcmFeatures(ramp, 8, 8)
    val (cn, hn, _, _, _) = Texture.glcmFeatures(noise, 8, 8)
    assert(cr < cn)
    assert(hr > hn)
  }

  test("firstOrderStats: hand-computed mean/sd/skew/iqr") {
    val (m, sd, sk, iqr) = Texture.firstOrderStats(Array(1.0, 2.0, 3.0, 4.0), 4)
    assert(math.abs(m - 2.5) < eps)
    assert(math.abs(sd - math.sqrt(1.25)) < eps)
    assert(math.abs(sk) < eps)
    assert(math.abs(iqr - 1.5) < eps) // type-7: q75=3.25, q25=1.75
  }

  test("firstOrderStats: skew sign and degenerate cases") {
    val (_, _, skR, _) = Texture.firstOrderStats(Array(0.0, 0.0, 0.0, 10.0), 4)
    assert(skR > 0) // long right tail
    val (m, sd, sk, iqr) = Texture.firstOrderStats(Array(5.0, 5.0), 2)
    assert(m == 5.0 && sd == 0.0 && sk == 0.0 && iqr == 0.0)
    assert(Texture.firstOrderStats(Array.empty[Double], 0) == ((0.0, 0.0, 0.0, 0.0)))
  }

  test("sampleFrameGlcm: one row per sampled frame, finite features") {
    val docs = Tables.load(spark, sfDir, "documents").limit(32)
    val withPayload = Binary.withPayload(docs)
    val out = Binary.sampleFrameGlcm(spark, withPayload, everyK = 2).toDF()
    val meta = Binary.decodeMeta(spark, withPayload)
      .select(col("doc_id"), (floor((col("n_frames") - 1) / 2) + 1).as("expect"))
    val got = out.groupBy("doc_id").count()
    assert(meta.join(got, "doc_id").filter(col("count") =!= col("expect")).count() == 0)
    // bounded/finite: energy and homogeneity in (0,1], |corr| <= 1
    val bad = out.filter(col("glcm_energy") <= 0 || col("glcm_energy") > 1 + 1e-9 ||
      col("glcm_homog") <= 0 || col("glcm_homog") > 1 + 1e-9 ||
      abs(col("glcm_corr")) > 1 + 1e-9 || col("px_sd") < 0)
    assert(bad.count() == 0)
  }
}
