package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained unigram-LM tokenizer (Kudo 2018 — the SentencePiece
  * unigram model): pieces with log probabilities. Driver-sized by
  * construction (vocabSize entries) and serializable, so it rides
  * into the encode expression like a literal — the broadcast-model
  * pattern of [[BpeModel]]/[[BigramModel]].
  *
  * Encoding is VITERBI segmentation: the piece sequence maximizing
  * the sum of piece log-probs. A character outside the training
  * alphabet can only be emitted via the unk fallback (scored
  * [[UnigramModel.unkScore]], strictly below every real piece) and is
  * counted `unk`. */
final class UnigramModel(val logProb: Map[String, Double],
                         val maxPieceLen: Int) extends Serializable {

  /** Fallback score for a single unknown character: below the worst
    * real piece by a margin, so a real segmentation always wins when
    * one exists. */
  val unkScore: Double =
    (if (logProb.isEmpty) 0.0 else logProb.values.min) - 10.0

  /** (n_words, n_pieces, n_unk) of a whitespace-split text. */
  def stats(text: UTF8String): GenericInternalRow = {
    var words = 0L
    var pieces = 0L
    var unk = 0L
    val it = text.toString.split("\\s+").iterator
    while (it.hasNext) {
      val w = it.next()
      if (w.nonEmpty) {
        words += 1
        val (np, nu) = encodeCounts(w)
        pieces += np
        unk += nu
      }
    }
    new GenericInternalRow(Array[Any](words, pieces, unk))
  }

  /** Viterbi-segment one word; returns (n_pieces, n_unk). */
  def encodeCounts(word: String): (Long, Long) = {
    val segs = encode(word)
    var unk = 0L
    var i = 0
    while (i < segs.length) {
      if (!logProb.contains(segs(i))) unk += 1
      i += 1
    }
    (segs.length.toLong, unk)
  }

  /** Viterbi-best segmentation of one word. Ties between equal-score
    * paths break toward the LONGER last piece (deterministic; matches
    * the backtrack order below). */
  def encode(word: String): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1) // start index of the best last piece
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) > Double.NegativeInfinity) {
          val piece = word.substring(i, j)
          val s = logProb.get(piece) match {
            case Some(lp) => lp
            case None => if (j - i == 1) unkScore else Double.NegativeInfinity
          }
          if (s > Double.NegativeInfinity) {
            val cand = best(i) + s
            // i ascends and strict > keeps the first i reaching the
            // max, so ties break toward the longer last piece
            if (cand > best(j)) { best(j) = cand; back(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    // backtrack
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) {
      val i = back(k)
      out += word.substring(i, k)
      k = i
    }
    out.reverseIterator.toArray
  }
}

/** Fused per-document unigram-tokenizer stats against a broadcast-sized
  * trained model: ONE map-only pass computing (n_words, n_pieces,
  * n_unk) — no word-grain explode, no vocab join (the [[BpeEncode]]
  * shape with Viterbi in place of merge replay). */
case class UnigramEncode(child: Expression, model: UnigramModel)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    model.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ulmModel", model, classOf[UnigramModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stats($c);")
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncode =
    copy(child = c)
}

object UnigramEncode {
  def apply(text: Column, model: UnigramModel): Column =
    GraftBridge.column(UnigramEncode(GraftBridge.expression(text), model))
}
