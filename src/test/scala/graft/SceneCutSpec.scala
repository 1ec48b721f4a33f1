package graft

import graft.multimodal.{Binary, SceneCut}
import org.apache.spark.sql.functions._

class SceneCutSpec extends SparkSpec {
  import spark.implicits._

  test("cuts, deltas and segment numbering on hand-built frames") {
    val frames = Seq(
      // asset 1: stable, jump up, stable, jump down
      (1L, 0, 10.0), (1L, 2, 11.0), (1L, 4, 50.0), (1L, 6, 51.0), (1L, 8, 12.0),
      // asset 2: monotone drift below threshold — no cuts
      (2L, 0, 5.0), (2L, 1, 9.0), (2L, 2, 13.0),
      // asset 3: single frame — no delta, no cut
      (3L, 0, 99.0)
    ).toDF("doc_id", "frame_idx", "mean_px")
    val got = SceneCut.cuts(frames, threshold = 20.0)
      .as[(Long, Int, Option[Double], Boolean, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap

    assert(got(1L).map(_._4) == Seq(false, false, true, false, true))
    assert(got(1L).map(_._5) == Seq(0L, 0L, 1L, 1L, 2L), "scene numbering")
    assert(got(1L)(2)._3.get == 39.0)
    assert(got(2L).forall(!_._4), "sub-threshold drift is not a cut")
    assert(got(3L) == Seq((3L, 0, None, false, 0L)),
      "first frame: null delta, not a cut, scene 0")
  }

  test("composes over the real frame-feature decode output") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val frames = Binary.sampleFrameFeatures(spark, Binary.withPayload(docs),
      everyK = 2).toDF()
    val got = SceneCut.cuts(frames, threshold = 30.0)
    assert(got.count() == frames.count(), "one row per sampled frame")
    // per asset: exactly one null delta (the first frame), segments
    // equal the running cut count
    val firsts = got.filter(col("delta").isNull).groupBy("doc_id").count()
      .as[(Long, Long)].collect()
    assert(firsts.nonEmpty && firsts.forall(_._2 == 1L))
    val bad = got.filter(col("is_cut") && abs(col("delta")) <= 30.0).count()
    assert(bad == 0)
  }
}
