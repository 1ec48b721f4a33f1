package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Audio

class VadSpec extends SparkSpec {
  import spark.implicits._

  private def frames(rows: (Long, Int, Double)*) =
    rows.toDF("doc_id", "frame_idx", "rms")

  test("consecutive active frames merge; gaps split segments") {
    // doc 1: active at 0,1,2 | gap | 5,6 — two segments
    val f = frames((1L, 0, 9.0), (1L, 1, 8.0), (1L, 2, 7.0),
      (1L, 3, 1.0), (1L, 4, 1.0), (1L, 5, 9.0), (1L, 6, 9.0))
    val got = Audio.vadSegments(f, rmsGate = 5.0)
      .orderBy("seg")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).toSeq
    assert(got == Seq((1L, 0, 2, 3L), (2L, 5, 6, 2L)))
  }

  test("the gate is inclusive and compares the rounded rms") {
    val f = frames((1L, 0, 5.0), (1L, 1, 4.9999))
    val got = Audio.vadSegments(f, rmsGate = 5.0).collect()
    assert(got.length == 1 && got.head.getLong(4) == 1L)
  }

  test("mean_rms is the decimal-exact segment mean; docs are isolated") {
    val f = frames((1L, 0, 6.0), (1L, 1, 8.0), (2L, 0, 7.0))
    val got = Audio.vadSegments(f, rmsGate = 5.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(4), r.getDouble(5)))).toMap
    assert(got((1L, 1L)) == (2L, 7.0))
    assert(got((2L, 1L)) == (1L, 7.0))
  }

  test("an all-silent asset emits no segments") {
    val f = frames((1L, 0, 1.0), (1L, 1, 2.0))
    assert(Audio.vadSegments(f, rmsGate = 5.0).count() == 0)
  }

  test("segments over the real frame features are well-formed") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fr = Audio.frameFeatures(spark,
      graft.multimodal.Binary.withPayload(docs), frameLen = 32, hop = 16)
      .toDF()
    val segs = Audio.vadSegments(fr, rmsGate = 25500.0).cache()
    assert(segs.count() > 0)
    // islands: start <= end, n_frames == end - start + 1 (consecutive)
    assert(segs.filter(col("start_frame") > col("end_frame")).count() == 0)
    assert(segs.filter(col("n_frames") =!=
      col("end_frame") - col("start_frame") + 1).count() == 0)
    // non-adjacent islands: consecutive segs of a doc leave a gap
    val adjacent = segs.as("a").join(segs.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("a.seg") + 1 === col("b.seg") &&
        col("b.start_frame") <= col("a.end_frame") + 1)
    assert(adjacent.count() == 0)
    segs.unpersist()
  }
}
