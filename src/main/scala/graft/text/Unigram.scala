package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{UnigramEncode, UnigramModel}

/** Unigram-LM tokenizer training + corpus tokenization (Kudo 2018 —
  * the SentencePiece unigram model), completing the tokenizer family
  * next to [[Bpe]]. The reference pipeline has no tokenizer stage; a
  * 100 TB corpus build runs one before packing.
  *
  * Distributed shape — the same as [[Bpe]]'s, because unigram training
  * ALSO needs only the WORD HISTOGRAM, not the corpus: the single
  * corpus-wide pass is the map-side-combined word count capped at the
  * top `maxWords` (the declared min-frequency analogue), and
  * everything after — seed-substring extraction, EM, pruning — runs
  * DRIVER-side on the vocabulary-bounded histogram. The learned model
  * (vocabSize pieces + log-probs) returns to the executors inside the
  * fused map-only [[UnigramEncode]] Viterbi kernel — no word-grain
  * explode, no vocab join, no per-round corpus pass.
  *
  * Algorithm (all public, Kudo 2018 §3):
  *  1. SEED: candidate pieces = the single characters (coverage —
  *     never pruned) plus the top `seedSize` multi-char substrings of
  *     histogram words (length <= maxPieceLen) by occurrence mass
  *     (count x frequency), ties lexicographic.
  *  2. EM: iterate expectation (forward-backward over each word's
  *     segmentation lattice -> expected piece counts, words weighted
  *     by histogram count) and maximization (renormalize log-probs).
  *  3. PRUNE: drop multi-char pieces by lowest expected count until
  *     `vocabSize` remains, then one more EM pass to renormalize.
  *     DECLARED simplification: SentencePiece ranks prune candidates
  *     by exact likelihood loss; expected count is its first-order
  *     proxy (a piece the E-step barely uses cannot cost likelihood),
  *     and the spec pins the behaviors that matter downstream —
  *     determinism, coverage, frequent-substring recovery, likelihood
  *     ascent.
  */
object Unigram {

  /** Learn a `vocabSize`-piece model from the corpus: ONE distributed
    * histogram pass + the driver-side EM/prune loop. */
  def train(df: DataFrame, text: Column, vocabSize: Int,
            maxWords: Int = 100000, maxPieceLen: Int = 8,
            seedSize: Int = 4000, emIters: Int = 2): UnigramModel = {
    val hist = Bpe.wordHistogram(df, text, maxWords).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, vocabSize, maxPieceLen, seedSize, emIters)
  }

  /** The driver-side trainer, exposed for spec replication. */
  def trainFromHistogram(hist: Array[(String, Long)], vocabSize: Int,
                         maxPieceLen: Int = 8, seedSize: Int = 4000,
                         emIters: Int = 2): UnigramModel = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    // ---- 1. seed: chars (mandatory) + top multi-char substrings
    val subMass = mutable.Map[String, Long]()
    val chars = mutable.Set[String]()
    hist.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        chars += w.substring(i, i + 1)
        var j = i + 2
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val s = w.substring(i, j)
          subMass(s) = subMass.getOrElse(s, 0L) + c
          j += 1
        }
        i += 1
      }
    }
    val seeds = subMass.toArray
      .sortBy { case (s, m) => (-m, s) }
      .take(seedSize).map(_._1)
    var pieces: Array[String] = (chars.toArray ++ seeds).distinct.sorted
    // uniform init over occurrence mass (any positive init works; mass
    // speeds convergence and is deterministic)
    var lp: Map[String, Double] = {
      val mass = pieces.map(p =>
        p -> math.max(1L, subMass.getOrElse(p, 1L)).toDouble).toMap
      val tot = mass.values.sum
      mass.map { case (p, m) => p -> math.log(m / tot) }
    }

    def emRound(vocab: Array[String], logp: Map[String, Double])
        : (Map[String, Double], Map[String, Double], Double) = {
      // forward-backward expected counts over every histogram word
      val expected = mutable.Map[String, Double]()
      var logLik = 0.0
      hist.foreach { case (w, c) =>
        val n = w.length
        val alpha = Array.fill(n + 1)(0.0)
        val beta = Array.fill(n + 1)(0.0)
        alpha(0) = 1.0
        var j = 1
        while (j <= n) {
          var i = math.max(0, j - maxPieceLen)
          while (i < j) {
            if (alpha(i) > 0.0) {
              logp.get(w.substring(i, j)).foreach { l =>
                alpha(j) += alpha(i) * math.exp(l)
              }
            }
            i += 1
          }
          j += 1
        }
        val z = alpha(n)
        if (z > 0.0) {
          logLik += c * math.log(z)
          beta(n) = 1.0
          var i = n - 1
          while (i >= 0) {
            var k = i + 1
            val kMax = math.min(n, i + maxPieceLen)
            while (k <= kMax) {
              if (beta(k) > 0.0) {
                logp.get(w.substring(i, k)).foreach { l =>
                  beta(i) += math.exp(l) * beta(k)
                }
              }
              k += 1
            }
            i -= 1
          }
          // expected count of piece occurrence (i, k)
          i = 0
          while (i < n) {
            var k = i + 1
            val kMax = math.min(n, i + maxPieceLen)
            while (k <= kMax) {
              val piece = w.substring(i, k)
              logp.get(piece).foreach { l =>
                val e = alpha(i) * math.exp(l) * beta(k) / z * c
                if (e > 0.0) expected(piece) = expected.getOrElse(piece, 0.0) + e
              }
              k += 1
            }
            i += 1
          }
        }
      }
      // unused pieces keep a floor so renormalization stays finite
      // (pruning removes them next); the floor mass is INCLUDED in the
      // normalizer so the model is a proper distribution — piece
      // probabilities sum to exactly 1, not 1 + floor·|unseen|
      val numUnseen = vocab.count(p => !expected.contains(p))
      val tot = expected.values.sum + 1e-12 * numUnseen
      val next = vocab.iterator.map { p =>
        val e = expected.getOrElse(p, 1e-12)
        p -> math.log(e / tot)
      }.toMap
      (next, expected.toMap, logLik)
    }

    var it = 0
    var expected: Map[String, Double] = Map.empty
    while (it < emIters) {
      val (next, exp, _) = emRound(pieces, lp)
      lp = next; expected = exp
      it += 1
    }
    // ---- 3. prune multi-char pieces by expected count to vocabSize
    val charSet = chars.toSet
    val keepMulti = math.max(0, vocabSize - charSet.size)
    val kept = pieces.filter(p => !charSet.contains(p))
      .sortBy(p => (-expected.getOrElse(p, 0.0), p))
      .take(keepMulti)
    pieces = (charSet.toArray ++ kept).sorted
    lp = {
      val sub = pieces.map(p => p -> lp.getOrElse(p, math.log(1e-12))).toMap
      sub // renormalized by the final EM round below
    }
    val (finalLp, _, _) = emRound(pieces, lp)
    new UnigramModel(finalLp, maxPieceLen)
  }

  /** Corpus log-likelihood of the histogram under a model — the spec's
    * EM-ascent probe (marginal over all segmentations). */
  def histogramLogLik(hist: Array[(String, Long)], model: UnigramModel): Double = {
    var ll = 0.0
    hist.foreach { case (w, c) =>
      val n = w.length
      val alpha = Array.fill(n + 1)(0.0)
      alpha(0) = 1.0
      var j = 1
      while (j <= n) {
        var i = math.max(0, j - model.maxPieceLen)
        while (i < j) {
          if (alpha(i) > 0.0) {
            model.logProb.get(w.substring(i, j)).foreach { l =>
              alpha(j) += alpha(i) * math.exp(l)
            }
          }
          i += 1
        }
        j += 1
      }
      if (alpha(n) > 0.0) ll += c * math.log(alpha(n))
    }
    ll
  }

  /** Per-document tokenization stats under a trained model:
    * (doc_id, n_words, n_pieces, n_unk) in one map-only pass. */
  def encodeStats(df: DataFrame, id: Column, text: Column,
                  model: UnigramModel): DataFrame =
    df.select(id.as("doc_id"), UnigramEncode(text, model).as("_s"))
      .select(col("doc_id"), col("_s.n_words").as("n_words"),
        col("_s.n_pieces").as("n_pieces"), col("_s.n_unk").as("n_unk"))
}
