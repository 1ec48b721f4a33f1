package graft

import graft.multimodal.{Audio, Binary, ImageDedup, MultimodalCorpus, SceneCut}
import org.apache.spark.sql.functions._

/** Mirrors CorpusBuildSpec for the multimodal build: one asset
  * engineered to fall at each stage, each gate's bite additionally
  * pinned directly against the standalone operator so the end-to-end
  * drop attributes to exactly one stage.
  *
  * Planted payloads (text bytes ARE the payload — Binary.withPayload):
  *   1 (A) survivor: English text; 46 bytes -> frames 0,2,4,6 with
  *     exactly 2 cuts at threshold 0.5 (the maxCuts=2 boundary), loud.
  *   3 (B) byte-identical to A with a higher id -> pHash Hamming 0,
  *     dropped as the non-canonical member at the image-dedup stage.
  *   4 (C) scene-unstable: 'b'-dominated words (uncancelled xor
  *     deltas -1.48/+5.23/-1.48 across the 4 sampled frames -> 3
  *     cuts) but GOOD text (6 tokens, 1 stopword) and loud audio, so
  *     only the scene gate explains its absence.
  *   5 (D) silent: period-4 control-byte wave (xor deltas cancel ->
  *     scene-stable; s16le samples 1793/263 -> rms ~1281).
  *   6 (E) text-fail: period-2 'x','~' wave (scene-stable, rms
  *     ~32376 -> loud) but a single 70-char token.
  *   7 (F) second survivor: English text, 1 cut, loud.
  */
class MultimodalCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val aText = "the cat sat on a mat and watched the birds fly"
  private val cText =
    "bbbbbbbbbbbbbb bbbbbbbbbb bbbbbbbbbb bbbbbbbbbb bbbbbbbbbb the"
  private val dText = "\u0001\u0007\u0007\u0001" * 17
  private val eText = "x~" * 35
  private val fText = "every good boy does fine and the band plays on for them all"

  private def assets = Binary.withPayload(Seq(
    (1L, aText, "en", "web"),
    (3L, aText, "en", "web"),
    (4L, cText, "en", "web"),
    (5L, dText, "en", "web"),
    (6L, eText, "en", "web"),
    (7L, fText, "en", "web")
  ).toDF("doc_id", "text", "lang", "source"))

  private def run(a: org.apache.spark.sql.DataFrame = assets) =
    MultimodalCorpus.run(a, maxHamming = 6, sceneThreshold = 0.5,
      maxCuts = 2, minRms = 5000.0, frameLen = 8, hop = 4)

  test("every stage drops exactly its engineered asset") {
    val kept = run().select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 7L))
  }

  test("stage 1 bite: the only perceptual pair is the planted payload dup") {
    val pairs = ImageDedup.nearDupPairs(spark, assets, maxHamming = 6)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 3L)))
  }

  test("stage 2 bite: only the unstable asset exceeds two cuts") {
    val frames = Binary.sampleFrameFeatures(spark, assets, everyK = 2).toDF()
    val cuts = SceneCut.cuts(frames, 0.5)
      .groupBy("doc_id").agg(max("segment").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(cuts(4L) === 3L)
    assert(cuts.removed(4L).values.forall(_ <= 2L))
    assert(cuts(1L) === 2L, "the survivor sits exactly at the maxCuts boundary")
  }

  test("stage 3 bite: only the control-byte asset is quiet") {
    val rms = Audio.frameFeatures(spark, assets, frameLen = 8, hop = 4).toDF()
      .groupBy("doc_id").agg(avg("rms").as("a"))
      .as[(Long, Double)].collect().toMap
    assert(rms(5L) < 5000.0)
    assert(rms.removed(5L).values.forall(_ > 5000.0))
  }

  test("stage 4 bite: the one-token asset fails the shared text rule; every asset that can reach the gate passes") {
    val keep = assets.select(col("doc_id"),
        graft.text.TextFeatures.qualityKeep(col("text")).as("k"))
      .as[(Long, Boolean)].collect().toMap
    assert(!keep(6L))
    // D (5) also fails the text rule but never reaches it — the audio
    // gate drops it first (stage-3 bite above); everyone else passes,
    // so E's end-to-end absence attributes to this gate alone
    assert(Seq(1L, 3L, 4L, 7L).forall(keep))
  }

  test("blur gate: a focus floor between the survivors' max_lap drops exactly the softer one") {
    // measured stub profiles: A (id 1) max_lap ~22800, F (id 7) ~33894
    // — minSharp 30000 sits between, so only A additionally drops
    val kept = MultimodalCorpus.run(assets, maxHamming = 6,
        sceneThreshold = 0.5, maxCuts = 2, minRms = 5000.0,
        minSharp = 30000.0, frameLen = 8, hop = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(7L))
  }

  test("clipping gate: the zz-heavy asset exceeds maxClip=0.5 and only that gate explains its absence") {
    // 'zz'/' z' byte pairs decode to s16 samples >= 30000 for ~2/3 of
    // the asset; it passes scene (1 cut), audio (rms ~25k) and text
    // (1/15 stopwords) — measured clip_frac 0.6364 vs <= 0.11 for the
    // other survivors
    val clipText = "zz zz zz zz the zz zz zz zz zz zz zz zz zz zz"
    val extended = Binary.withPayload(Seq(
      (1L, aText, "en", "web"), (3L, aText, "en", "web"),
      (4L, cText, "en", "web"), (5L, dText, "en", "web"),
      (6L, eText, "en", "web"), (7L, fText, "en", "web"),
      (8L, clipText, "en", "web")
    ).toDF("doc_id", "text", "lang", "source"))
    def go(maxClip: Double) = MultimodalCorpus.run(extended, maxHamming = 6,
        sceneThreshold = 0.5, maxCuts = 2, minRms = 5000.0,
        maxClip = maxClip, frameLen = 8, hop = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(go(1.0) === Set(1L, 7L, 8L), "clip gate off: the asset survives everything else")
    assert(go(0.5) === Set(1L, 7L), "clip gate on: only the planted asset drops")
  }

  test("image-dedup keep is the cluster canonical, not an arbitrary member") {
    // swap ids 1 and 3: the canonical follows min id, so 1 survives
    val swapped = assets.withColumn("doc_id",
      when($"doc_id" === 1L, 3L).when($"doc_id" === 3L, 1L)
        .otherwise($"doc_id"))
    val kept = run(swapped).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 7L))
  }

  test("survivors carry their media attributes") {
    val rows = run().select("doc_id", "lang", "source", "n_scenes")
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows.keySet === Set(1L, 7L))
    assert(rows(1L) === ("en", "web", 3L), "2 cuts -> 3 scenes")
    assert(rows(7L) === ("en", "web", 2L), "1 cut -> 2 scenes")
    val loud = run().select("avg_rms").as[Double].collect()
    assert(loud.forall(_ >= 5000.0))
  }
}
