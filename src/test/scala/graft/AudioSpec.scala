package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Audio, AudioFrame}

/** [[graft.multimodal.Audio]] — s16le parsing (sign, endianness, odd
  * tail), framing arithmetic, hand-computed rms/zcr/peak, and
  * partitioning invariance. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  private def pcm(samples: Seq[Int]): Array[Byte] =
    samples.flatMap { s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    }.toArray

  private def run(payloads: Seq[(Long, Array[Byte])], frameLen: Int,
                  hop: Int, parts: Int = 1): Seq[AudioFrame] =
    Audio.frameFeatures(spark,
        payloads.toDF("doc_id", "payload").repartition(parts),
        frameLen = frameLen, hop = hop)
      .collect().toSeq.sortBy(f => (f.doc_id, f.frame_idx))

  test("constant signal: rms is the level, zcr zero, peak the level") {
    val got = run(Seq(1L -> pcm(Seq.fill(4)(100))), frameLen = 4, hop = 4)
    assert(got === Seq(AudioFrame(1L, 0, 4, 100.0, 0.0, 100)))
  }

  test("alternating full-swing signal: every step crosses zero") {
    val s = Seq(1000, -1000, 1000, -1000, 1000)
    val got = run(Seq(1L -> pcm(s)), frameLen = 5, hop = 5)
    assert(got === Seq(AudioFrame(1L, 0, 5, 1000.0, 1.0, 1000)))
  }

  test("sign and endianness: 0x8000 is -32768, 0x7fff is 32767") {
    val got = run(Seq(1L -> Array[Byte](0x00, 0x80.toByte, 0xff.toByte, 0x7f)),
      frameLen = 2, hop = 2)
    val want = AudioFrame(1L, 0, 2,
      graft.functions.Numeric.croundD(
        math.sqrt((32768.0 * 32768.0 + 32767.0 * 32767.0) / 2), 4),
      1.0, 32768)
    assert(got === Seq(want))
  }

  test("framing: hop overlap count, trailing odd byte and short assets drop") {
    val ten = pcm(1 to 10)
    val got = run(Seq(
      1L -> ten,                          // (10-4)/2+1 = 4 frames
      2L -> (pcm(1 to 5) :+ 9.toByte),    // 5 samples + odd tail: 1 frame
      3L -> pcm(Seq(1, 2, 3))), frameLen = 4, hop = 2)
    assert(got.map(f => (f.doc_id, f.frame_idx)) ===
      Seq((1L, 0), (1L, 1), (1L, 2), (1L, 3), (2L, 0)))
    // frame 1 of doc 1 covers samples 3..6
    val f1 = got.find(f => f.doc_id == 1L && f.frame_idx == 1).get
    assert(f1.rms === graft.functions.Numeric.croundD(
      math.sqrt((9.0 + 16 + 25 + 36) / 4), 4))
    // zeros do not count as crossings
    assert(run(Seq(4L -> pcm(Seq(5, 0, -5, 0))), 4, 4).head.zcr === 0.0)
  }

  test("partitioning-invariant") {
    val payloads = (1L to 40L).map(i =>
      i -> pcm((0 until 30).map(j => ((i * 31 + j * 17) % 4001).toInt - 2000)))
    assert(run(payloads, 8, 3, parts = 1) === run(payloads, 8, 3, parts = 7))
  }
}
