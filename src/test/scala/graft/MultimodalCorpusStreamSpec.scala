package graft

import graft.multimodal.{Binary, MultimodalCorpus}
import graft.streaming.{AssetIn, AssetKept, MultimodalCorpusStream}
import org.apache.spark.sql.streaming.Trigger

/** Stream/batch parity for the multimodal corpus filter: the per-asset
  * gates must agree with MultimodalCorpus bit-for-bit (attributes
  * included); the image-dedup stage is declared batch-only, and the
  * declared divergence is pinned (the stream keeps a payload dup the
  * batch build would collapse). */
class MultimodalCorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  // the MultimodalCorpusSpec cast, minus the payload dup (batch stage
  // 1 is then a no-op, so stream == batch end to end)
  private val aText = "the cat sat on a mat and watched the birds fly"
  private val cText =
    "bbbbbbbbbbbbbb bbbbbbbbbb bbbbbbbbbb bbbbbbbbbb bbbbbbbbbb the"
  private val dText = "" * 17
  private val eText = "x~" * 35
  private val fText = "every good boy does fine and the band plays on for them all"

  private def rows(pairs: (Long, String)*): Seq[AssetIn] =
    pairs.map { case (id, t) =>
      AssetIn(id, t, "en", "web", t.getBytes("UTF-8"))
    }

  private def dupFree = rows(
    1L -> aText, 4L -> cText, 5L -> dText, 6L -> eText, 7L -> fText)

  private def runStream(batches: Seq[Seq[AssetIn]], name: String,
                        minSharp: Double = 0.0,
                        maxClip: Double = 1.0): Set[AssetKept] = {
    implicit val sql = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[AssetIn]
    val q = MultimodalCorpusStream.filtered(stream.toDS(),
        sceneThreshold = 0.5, maxCuts = 2, minRms = 5000.0,
        minSharp = minSharp, maxClip = maxClip,
        frameLen = 8, hop = 4)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow())
    batches.foreach(b => stream.addData(b))
    val run = q.start()
    try assert(run.awaitTermination(60000)) finally run.stop()
    spark.table(name).as[AssetKept].collect().toSet
  }

  private def runBatch(assets: Seq[AssetIn], minSharp: Double = 0.0,
                       maxClip: Double = 1.0): Set[AssetKept] =
    MultimodalCorpus.run(
        Binary.withPayload(assets.map(a => (a.doc_id, a.text, a.lang, a.source))
          .toDF("doc_id", "text", "lang", "source")),
        maxHamming = 6, sceneThreshold = 0.5, maxCuts = 2, minRms = 5000.0,
        minSharp = minSharp, maxClip = maxClip,
        frameLen = 8, hop = 4)
      .as[AssetKept].collect().toSet

  test("stream equals batch on a dup-free corpus, attributes bit-for-bit") {
    val want = runBatch(dupFree)
    assert(want.map(_.doc_id) === Set(1L, 7L), "fixture sanity")
    assert(runStream(Seq(dupFree), "mmcs_one") === want)
  }

  test("stateless gates: assets split across micro-batches change nothing") {
    val want = runBatch(dupFree)
    val (x, y) = dupFree.partition(_.doc_id <= 4L)
    assert(runStream(Seq(x, y), "mmcs_split") === want)
  }

  test("blur + clip gates active: stream still equals batch, attributes bit-for-bit") {
    // minSharp 30000 sits between the two survivors' max_lap (A ~22800,
    // F ~33894) so the gate actively bites in BOTH surfaces; shared
    // kernels (Binary.maxSampledLapVar, Audio.clipFraction) make the
    // attribute values identical, not just the survivor set
    val want = runBatch(dupFree, minSharp = 30000.0, maxClip = 0.5)
    assert(want.map(_.doc_id) === Set(7L), "fixture sanity: only F stays")
    assert(runStream(Seq(dupFree), "mmcs_gates",
      minSharp = 30000.0, maxClip = 0.5) === want)
  }

  test("declared divergence: the batch-only image-dedup stage keeps dups in the stream") {
    val withDup = rows(1L -> aText, 3L -> aText, 7L -> fText)
    val got = runStream(Seq(withDup), "mmcs_dup")
    assert(got.map(_.doc_id) === Set(1L, 3L, 7L),
      "the stream keeps both payload-identical assets")
    assert(runBatch(withDup).map(_.doc_id) === Set(1L, 7L),
      "the batch build collapses them to the canonical")
  }
}
