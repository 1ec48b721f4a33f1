package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeEncode, BpeModel}

/** BPE vocabulary training + corpus tokenization (Sennrich et al.
  * 2016) — pre-training's step zero. The reference pipeline has no
  * tokenizer stage; a 100 TB corpus build runs one before packing.
  *
  * Distributed shape — the production trainer's: BPE learning needs
  * only the WORD HISTOGRAM, not the corpus (HuggingFace trainers do
  * exactly this), so the single corpus-wide pass is a
  * map-side-combined word count, capped at the top `maxWords` by
  * (count desc, word) — a TakeOrdered, declared: dropping the long
  * tail of hapax typos is what real trainers' min-frequency does. The
  * merge loop then runs DRIVER-side on the vocabulary-bounded
  * histogram (deterministic: best pair by count, ties by pair
  * lexicographic order), and the learned model returns to the
  * executors inside the fused map-only [[BpeEncode]] kernel — no
  * word-grain explode, no vocab join, no per-round corpus pass. */
object Bpe {

  /** Capped word histogram: the one corpus-wide pass. */
  def wordHistogram(df: DataFrame, text: Column, maxWords: Int): DataFrame =
    df.select(explode(split(text, "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(maxWords)

  /** Learn `numMerges` merges from the histogram (collected driver-side;
    * bounded by `maxWords`). Stops early when no pair occurs twice. */
  def train(df: DataFrame, text: Column, numMerges: Int,
            maxWords: Int = 100000): BpeModel = {
    val hist = wordHistogram(df, text, maxWords).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, numMerges)
  }

  /** The driver-side merge loop, exposed for spec replication. */
  def trainFromHistogram(hist: Array[(String, Long)], numMerges: Int): BpeModel = {
    // each word as its mutable symbol sequence, weighted by count
    val words: Array[(Array[String], Long)] = hist.map { case (w, c) =>
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b += "</w>"
      (b.result(), c)
    }
    val vocab = mutable.Set[String]()
    words.foreach(_._1.foreach(vocab += _))
    val ranks = mutable.Map[(String, String), Int]()
    var syms = words
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = mutable.Map[(String, String), Long]()
      syms.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2)
      if (best.isEmpty) exhausted = true
      else {
        // max count, ties by lexicographically smallest (left, right)
        val (pair, _) = best.minBy { case ((a, b), c) => (-c, a, b) }
        ranks(pair) = m
        vocab += pair._1 + pair._2
        syms = syms.map { case (s, c) =>
          if (s.length < 2) (s, c)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == pair._1 && s(i + 1) == pair._2) {
                out += s(i) + s(i + 1); i += 2
              } else { out += s(i); i += 1 }
            }
            (out.result(), c)
          }
        }
        m += 1
      }
    }
    new BpeModel(ranks.toMap, vocab.toSet)
  }

  /** Per-document tokenization stats under a trained model:
    * (doc_id, n_words, n_subwords, n_unk) in one map-only pass. */
  def encodeStats(df: DataFrame, id: Column, text: Column,
                  model: BpeModel): DataFrame =
    df.select(id.as("doc_id"), BpeEncode(text, model).as("_s"))
      .select(col("doc_id"), col("_s.n_words").as("n_words"),
        col("_s.n_subwords").as("n_subwords"), col("_s.n_unk").as("n_unk"))

  /** Per-document out-of-vocabulary WORD rate against the top-`v`
    * word vocabulary — the oracled sibling of the BPE surface (whole
    * pipeline is relational: capped histogram, broadcast-sized vocab
    * joined back at token grain, per-doc aggregate). */
  def oovRate(df: DataFrame, id: Column, text: Column, v: Int): DataFrame = {
    val vocab = wordHistogram(df, text, v).select(col("word"))
    val toks = df.select(id.as("doc_id"),
        explode(split(text, "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    toks.join(vocab.withColumn("_in", lit(1L)), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"),
        graft.functions.Numeric.cround(
          sum(when(col("_in").isNull, 1.0).otherwise(0.0)) / count(lit(1)), 6)
          .as("oov_rate"))
  }
}
