package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{WordPieceEncode, WordPieceModel}

/** WordPiece vocabulary training + corpus tokenization (Schuster &
  * Nakajima 2012 — BERT's tokenizer), completing the tokenizer trio
  * next to [[Bpe]] (merge-by-count) and [[Unigram]] (EM/Viterbi).
  *
  * Distributed shape — identical to [[Bpe]]'s, because WordPiece
  * training is the SAME histogram-driven merge loop with a different
  * pair score: the one corpus-wide pass is the shared capped word
  * count, and the driver-side loop merges the adjacent symbol pair
  * maximizing the LIKELIHOOD RATIO count(pair) / (count(left) *
  * count(right)) — the published WordPiece objective: merge what
  * raises corpus likelihood under a unigram model most, not what is
  * merely frequent (ties: higher pair count, then lexicographic).
  * Non-initial symbols carry the `##` continuation prefix, so the
  * learned vocabulary is directly the BERT-style piece set. The model
  * returns to the executors inside the fused map-only
  * [[WordPieceEncode]] greedy longest-match kernel — no word-grain
  * explode, no vocab join, no per-round corpus pass.
  */
object WordPiece {

  /** Learn `numMerges` merges from the corpus histogram. */
  def train(df: DataFrame, text: Column, numMerges: Int,
            maxWords: Int = 100000): WordPieceModel = {
    val hist = Bpe.wordHistogram(df, text, maxWords).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, numMerges)
  }

  /** The driver-side merge loop, exposed for spec replication. */
  def trainFromHistogram(hist: Array[(String, Long)],
                         numMerges: Int): WordPieceModel = {
    // each word as its symbol sequence: first char bare, rest ##-prefixed
    var syms: Array[(Array[String], Long)] = hist.map { case (w, c) =>
      val b = Array.newBuilder[String]
      var i = 0
      var first = true
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val s = new String(Character.toChars(cp))
        b += (if (first) s else "##" + s)
        first = false
        i += Character.charCount(cp)
      }
      (b.result(), c)
    }
    val vocab = mutable.Set[String]()
    syms.foreach(_._1.foreach(vocab += _))
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      // symbol and adjacent-pair counts over the current segmentation
      val symCounts = mutable.Map[String, Long]()
      val pairCounts = mutable.Map[(String, String), Long]()
      syms.foreach { case (s, c) =>
        var i = 0
        while (i < s.length) {
          symCounts(s(i)) = symCounts.getOrElse(s(i), 0L) + c
          if (i < s.length - 1) {
            val p = (s(i), s(i + 1))
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          }
          i += 1
        }
      }
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        // max likelihood ratio (double, as the published trainers
        // score it); ties by higher pair count, then lexicographically
        // smallest pair — fully deterministic
        val best = candidates.keysIterator.reduceLeft { (p, q) =>
          val (pn, qn) = (candidates(p), candidates(q))
          val ps = pn.toDouble / (symCounts(p._1).toDouble * symCounts(p._2).toDouble)
          val qs = qn.toDouble / (symCounts(q._1).toDouble * symCounts(q._2).toDouble)
          if (ps > qs) p
          else if (ps < qs) q
          else if (pn > qn) p
          else if (pn < qn) q
          else if ((p._1 < q._1) || (p._1 == q._1 && p._2 <= q._2)) p
          else q
        }
        val merged = best._1 + best._2.stripPrefix("##")
        vocab += merged
        syms = syms.map { case (s, c) =>
          if (s.length < 2) (s, c)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == best._1 && s(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += s(i); i += 1 }
            }
            (out.result(), c)
          }
        }
        m += 1
      }
    }
    val maxLen = if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max
    new WordPieceModel(vocab.toSet, maxLen)
  }

  /** Per-document tokenization stats under a trained model:
    * (doc_id, n_words, n_subwords, n_unk) in one map-only pass. */
  def encodeStats(df: DataFrame, id: Column, text: Column,
                  model: WordPieceModel): DataFrame =
    df.select(id.as("doc_id"), WordPieceEncode(text, model).as("_s"))
      .select(col("doc_id"), col("_s.n_words").as("n_words"),
        col("_s.n_subwords").as("n_subwords"), col("_s.n_unk").as("n_unk"))
}
