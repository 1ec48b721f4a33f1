package graft

import org.apache.spark.sql.functions._

import graft.functions.UnigramModel
import graft.text.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // ---- Viterbi encode against hand-built models (exact) ----

  test("Viterbi picks the max-probability segmentation") {
    val m = new UnigramModel(
      Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -2.5), 8)
    // ab+c = -3.5 beats a+b+c = -6.5
    assert(m.encode("abc").toSeq == Seq("ab", "c"))
    // a+ab = -3.0 beats ab+? (no "b"-less path) and a+a+b = -6.0
    assert(m.encode("aab").toSeq == Seq("a", "ab"))
  }

  test("equal-score ties break toward the longer last piece") {
    val m = new UnigramModel(
      Map("ab" -> -2.0, "a" -> -1.0, "b" -> -1.0), 8)
    // a+b and ab both score -2.0: the longer last piece wins
    assert(m.encode("ab").toSeq == Seq("ab"))
  }

  test("unknown characters fall back to unk-scored singletons") {
    val m = new UnigramModel(Map("x" -> -1.0), 8)
    assert(m.encode("xyz").toSeq == Seq("x", "y", "z"))
    assert(m.encodeCounts("xyz") == ((3L, 2L)))
    // a real segmentation always beats one touching unk
    val m2 = new UnigramModel(Map("x" -> -50.0, "xy" -> -60.0), 8)
    assert(m2.encode("xy").toSeq == Seq("xy"))
  }

  // ---- training on a histogram (driver loop) ----

  private val hist: Array[(String, Long)] =
    Array(("ingest", 40L), ("testing", 30L), ("resting", 20L), ("rest", 10L))

  test("frequent substrings survive training and shorten segmentation") {
    val m = Unigram.trainFromHistogram(hist, vocabSize = 20)
    // multi-char pieces are kept (vocab 20 > the 7-char alphabet) and
    // Viterbi actually uses them: fewer pieces than characters
    assert(m.logProb.keySet.exists(_.length > 1))
    assert(m.encode("testing").length < "testing".length)
  }

  test("training is deterministic") {
    val m1 = Unigram.trainFromHistogram(hist, vocabSize = 15)
    val m2 = Unigram.trainFromHistogram(hist, vocabSize = 15)
    assert(m1.logProb == m2.logProb)
  }

  test("every training character is covered: zero unk on the corpus") {
    val m = Unigram.trainFromHistogram(hist, vocabSize = 8) // chars only
    hist.foreach { case (w, _) =>
      assert(m.encodeCounts(w)._2 == 0L, s"unk in $w")
    }
  }

  test("EM iterations do not decrease corpus likelihood (no pruning)") {
    // vocab large enough that pruning keeps every seed: pure EM ascent
    val big = 10000
    val ll = (1 to 3).map { k =>
      val m = Unigram.trainFromHistogram(hist, vocabSize = big, emIters = k)
      Unigram.histogramLogLik(hist, m)
    }
    assert(ll(1) >= ll(0) - 1e-9 && ll(2) >= ll(1) - 1e-9, ll.toString)
  }

  test("a multi-piece vocabulary never needs more pieces than chars-only") {
    // vocabSize 7 == the alphabet: pruning drops every multi piece, so
    // each word segments into exactly its characters — the upper bound
    val charsOnly = Unigram.trainFromHistogram(hist, vocabSize = 7)
    val large = Unigram.trainFromHistogram(hist, vocabSize = 30)
    hist.foreach { case (w, _) =>
      assert(charsOnly.encodeCounts(w)._1 == w.length.toLong, w)
      assert(large.encodeCounts(w)._1 <= w.length.toLong, w)
    }
  }

  // ---- the Spark surface ----

  test("encodeStats kernel matches the driver-side Viterbi") {
    val docs = Seq(
      (1L, "testing ingest"), (2L, "rest resting"), (3L, "")
    ).toDF("doc_id", "text")
    val m = Unigram.trainFromHistogram(hist, vocabSize = 20)
    val got = Unigram.encodeStats(docs, col("doc_id"), col("text"), m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val exp = Map(
      1L -> Seq("testing", "ingest"), 2L -> Seq("rest", "resting"),
      3L -> Seq.empty[String]
    ).map { case (id, ws) =>
      val counts = ws.map(w => m.encodeCounts(w))
      id -> ((ws.length.toLong, counts.map(_._1).sum, counts.map(_._2).sum))
    }
    assert(got == exp)
  }

  test("q_ulm runs end-to-end on the test corpus") {
    val out = SparkEntry.queries("q_ulm")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1)) // every word is >= 1 piece
      assert(r.getLong(3) <= r.getLong(2)) // unk pieces are pieces
    }
    // the histogram cap can drop rare words (and so rare alphabet
    // chars), but the corpus-trained model must cover the corpus's
    // overwhelming mass: unk stays a vanishing fraction
    val (p, u) = rows.foldLeft((0L, 0L)) { case ((a, b), r) =>
      (a + r.getLong(2), b + r.getLong(3)) }
    assert(u.toDouble / p < 0.01, s"unk=$u of pieces=$p")
  }
}
