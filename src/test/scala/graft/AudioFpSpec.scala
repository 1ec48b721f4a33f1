package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Audio

class AudioFpSpec extends SparkSpec {
  import spark.implicits._

  private def frames(rows: (Long, Int, Double)*) =
    rows.toDF("doc_id", "frame_idx", "rms")

  test("the fingerprint packs delta signs MSB-first, hand-computed") {
    // doc 1 contour: 1 -> 3 (up) -> 2 (down) -> 5 (up) = bits 101 = 5
    val f = frames((1L, 0, 1.0), (1L, 1, 3.0), (1L, 2, 2.0), (1L, 3, 5.0))
    val r = Audio.rmsFingerprint(f, bits = 8).collect().head
    assert(r.getAs[Int]("n_bits") == 3 && r.getAs[Long]("fp") == 5L)
  }

  test("equal deltas pack as 0; frames beyond the bit budget are ignored") {
    val f = frames((1L, 0, 2.0), (1L, 1, 2.0), (1L, 2, 4.0),
      (1L, 3, 9.0)) // with bits=2 only frames 0..2 count: bits 01 = 1
    val r = Audio.rmsFingerprint(f, bits = 2).collect().head
    assert(r.getAs[Int]("n_bits") == 2 && r.getAs[Long]("fp") == 1L)
  }

  test("identical contours group; the canonical is the min doc id") {
    val f = frames(
      (7L, 0, 1.0), (7L, 1, 2.0), (7L, 2, 1.0),
      (3L, 0, 5.0), (3L, 1, 9.0), (3L, 2, 4.0), // same up-down shape
      (9L, 0, 2.0), (9L, 1, 1.0), (9L, 2, 3.0)) // different shape
    val got = Audio.rmsFingerprint(f, bits = 8, minBits = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_of"), r.getAs[Int]("is_dup"))).toMap
    assert(got(3L) == (3L, 0) && got(7L) == (3L, 1))
    assert(got(9L) == (9L, 0))
  }

  test("contours below the evidence floor are never claimed as dups") {
    // both docs share the single-bit contour (n_bits 1, fp 1) — at the
    // default floor (bits/2 = 4) neither may claim the other
    val f = frames((5L, 0, 1.0), (5L, 1, 2.0), (8L, 0, 3.0), (8L, 1, 7.0))
    val got = Audio.rmsFingerprint(f, bits = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_of"), r.getAs[Int]("is_dup"))).toMap
    assert(got(5L) == (5L, 0) && got(8L) == (8L, 0))
    // with the floor lowered explicitly the same pair groups
    val low = Audio.rmsFingerprint(f, bits = 8, minBits = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_of"), r.getAs[Int]("is_dup"))).toMap
    assert(low(5L) == (5L, 0) && low(8L) == (5L, 1))
  }

  test("a single-frame asset fingerprints as (0, 0) and never collides with real contours") {
    val f = frames((1L, 0, 4.0), (2L, 0, 1.0), (2L, 1, 2.0))
    val got = Audio.rmsFingerprint(f, bits = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_bits"), r.getAs[Long]("fp"), r.getAs[Int]("is_dup")))
      .toMap
    assert(got(1L) == (0, 0L, 0))
    assert(got(2L) == (1, 1L, 0)) // n_bits differs -> no collision
  }

  test("fingerprints over the real frames are deterministic and grouped consistently") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fr = Audio.frameFeatures(spark,
      graft.multimodal.Binary.withPayload(docs), frameLen = 32, hop = 16)
      .toDF()
    val a = Audio.rmsFingerprint(fr, bits = 12).collect()
      .map(_.toString).sorted.toSeq
    val b = Audio.rmsFingerprint(fr.repartition(7), bits = 12).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // every dup points at a real canonical with the same fingerprint
    val df = Audio.rmsFingerprint(fr, bits = 12).cache()
    val joined = df.as("x").join(df.as("y"),
      col("x.dup_of") === col("y.doc_id") &&
        (col("x.fp") =!= col("y.fp") || col("x.n_bits") =!= col("y.n_bits")))
    assert(joined.count() == 0)
    df.unpersist()
  }
}
