package graft

import graft.text.CorpusBuild

class CorpusBuildSpec extends SparkSpec {
  import spark.implicits._

  private val evalText =
    "the quick brown fox jumps over the lazy sleeping dog"

  // one doc engineered to fall at each stage:
  //   2 -> quality gate (2 tokens), 3 -> exact dup of 1 (higher id),
  //   4 -> near-dup of 1 (8/10 shared 3-grams -> jaccard 0.8, canonical 1),
  //   5 -> embeds the eval text verbatim (decontamination),
  //   7 -> lang "xx", sampled out at rate 0.0
  private def corpus = Seq(
    (1L, "the cat sat on a mat and watched the birds fly", "en", "web"),
    (2L, "too short", "en", "web"),
    (3L, "the cat sat on a mat and watched the birds fly", "en", "web"),
    (4L, "the cat sat on a mat and watched the birds soar", "en", "web"),
    (5L, s"intro the words $evalText the end closing", "en", "web"),
    (6L, "a bird in the hand is worth two in the bush today", "en", "web"),
    (7L, "the sun and the moon and the stars shine bright tonight", "xx", "web")
  ).toDF("doc_id", "text", "lang", "source")

  private def eval = Seq((100L, evalText, "en", "web"))
    .toDF("doc_id", "text", "lang", "source")

  test("every stage drops exactly its engineered document") {
    val kept = CorpusBuild.run(corpus, eval, rates = Map("xx" -> 0.0))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 6L))
  }

  test("stage 0 provenance gate: a junk source's GOOD documents drop wholesale") {
    // junkfarm's keep rate is 1/3 (< 0.6): docs 11/12 fail quality on
    // their own, and 10 — which passes every per-doc stage — must drop
    // with its source (the leak the doc-level gate alone cannot stop)
    val withFarm = corpus.union(Seq(
      (10L, "a perfectly fine sentence with the usual stopwords in it", "en", "junkfarm"),
      (11L, "junk", "en", "junkfarm"),
      (12L, "noise", "en", "junkfarm")
    ).toDF("doc_id", "text", "lang", "source"))
    val ungated = CorpusBuild.run(withFarm, eval, rates = Map("xx" -> 0.0))
      .select("doc_id").as[Long].collect().toSet
    assert(ungated === Set(1L, 6L, 10L), "without the gate the farm doc leaks")
    val gated = CorpusBuild.run(withFarm, eval, rates = Map("xx" -> 0.0),
        sourceGate = Some((3L, 0.6, 0.5)))
      .select("doc_id").as[Long].collect().toSet
    assert(gated === Set(1L, 6L), "stage 0 must cut the whole junk source")
  }

  test("without sampling rates the language survives; the rest still drop") {
    val kept = CorpusBuild.run(corpus, eval)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 6L, 7L))
  }

  test("near-dup keep is the cluster canonical, not an arbitrary member") {
    // swap ids 1 and 4: the canonical follows min id, so 1 survives
    // again even though the other text now carries the smaller payload
    val swapped = corpus
      .withColumn("doc_id",
        org.apache.spark.sql.functions.when($"doc_id" === 1L, 4L)
          .when($"doc_id" === 4L, 1L).otherwise($"doc_id"))
    val kept = CorpusBuild.run(swapped, eval, rates = Map("xx" -> 0.0))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 6L))
  }

  test("survivor columns pass through untouched") {
    val row = CorpusBuild.run(corpus, eval, rates = Map("xx" -> 0.0))
      .filter($"doc_id" === 6L).as[(Long, String, String)].collect().toSeq
    assert(row === Seq((6L, "en", "web")))
  }
}
