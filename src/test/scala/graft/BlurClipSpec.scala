package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Audio, Binary, Texture}

class BlurClipSpec extends SparkSpec {
  import spark.implicits._

  test("laplacianVar: flat and linear-gradient frames score exactly zero; checkerboard is maximal") {
    val flat = Array.fill(64)(7.0)
    assert(Texture.laplacianVar(flat, 8, 8) == 0.0)
    // linear ramps are in the Laplacian's null space — a smooth
    // (defocused) gradient is "perfectly blurry"
    val ramp = Array.tabulate(64)(i => (i % 8).toDouble * 10 + (i / 8).toDouble * 3)
    assert(Texture.laplacianVar(ramp, 8, 8) == 0.0)
    // checkerboard: every interior response is ±1020, mean 0 ->
    // variance = 1020^2
    val checker = Array.tabulate(64)(i => if ((i % 8 + i / 8) % 2 == 0) 255.0 else 0.0)
    assert(Texture.laplacianVar(checker, 8, 8) == 1020.0 * 1020.0)
    // degenerate dims have no interior
    assert(Texture.laplacianVar(Array.fill(8)(5.0), 8, 1) == 0.0)
  }

  test("sampleFrameBlur emits one row per sampled frame with the asset's measure") {
    val df = Seq((1L, "abcdefgh" * 8)).toDF("doc_id", "text")
    val out = Binary.sampleFrameBlur(spark, Binary.withPayload(df), everyK = 1)
      .collect()
    val nFrames = 1 + math.floorMod(64, 8)
    assert(out.length == nFrames)
    assert(out.forall(_.lap_var >= 0.0))
  }

  test("clipStats: hand-built s16le payloads count clipped samples exactly") {
    // samples: 32767 (clip), -32768 (clip), 4096 (no), 29952 (no at
    // 30000), 30208 (clip at 30000); trailing odd byte ignored
    val bytes = Array[Byte](
      0xFF.toByte, 0x7F.toByte, // 32767
      0x00, 0x80.toByte,        // -32768
      0x00, 0x10,               // 4096
      0x00, 0x75,               // 29952
      0x00, 0x76,               // 30208
      0x42)                     // trailing odd byte
    val df = Seq((7L, bytes)).toDF("doc_id", "payload")
    val out = Audio.clipStats(spark, df, threshold = 30000).collect()
    assert(out.length == 1)
    assert(out.head.n_samples == 5L && out.head.n_clipped == 3L)
    assert(out.head.clip_frac == 0.6)
    // production threshold: only full-scale samples count
    val strict = Audio.clipStats(spark, df).collect().head
    assert(strict.n_clipped == 2L)
  }

  test("clipStats skips empty payloads and matches a brute-force recount on real docs") {
    val docs = Binary.withPayload(Tables.documents(spark, sfDir)).limit(40)
    val got = Audio.clipStats(spark, docs, threshold = 30000)
      .collect().map(c => c.doc_id -> (c.n_samples, c.n_clipped)).toMap
    val raw = docs.select(col("doc_id"), col("payload")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    raw.foreach { case (id, b) =>
      val n = b.length / 2
      if (n == 0) assert(!got.contains(id))
      else {
        val clipped = (0 until n).count { i =>
          val s = ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt
          math.abs(s) >= 30000
        }
        assert(got(id) == ((n.toLong, clipped.toLong)), s"doc $id")
      }
    }
  }
}
