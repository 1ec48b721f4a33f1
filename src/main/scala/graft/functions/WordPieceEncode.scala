package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained WordPiece vocabulary (Schuster & Nakajima 2012 — BERT's
  * tokenizer). Pieces are word-initial strings or `##`-prefixed
  * continuations. Driver-sized and serializable — the broadcast-model
  * pattern of [[BpeModel]]/[[UnigramModel]].
  *
  * Encoding is the BERT greedy LONGEST-MATCH-FIRST walk: from each
  * position take the longest vocab piece (continuations matched with
  * the `##` prefix); if no piece matches at some position the WHOLE
  * word becomes a single unknown token (BERT's [UNK] semantics, not a
  * per-character fallback). */
final class WordPieceModel(val vocab: Set[String],
                           val maxPieceLen: Int) extends Serializable {

  /** (n_words, n_subwords, n_unk) of a whitespace-split text; an
    * unknown word contributes 1 subword and 1 unk. */
  def stats(text: UTF8String): GenericInternalRow = {
    var words = 0L
    var subs = 0L
    var unk = 0L
    val it = text.toString.split("\\s+").iterator
    while (it.hasNext) {
      val w = it.next()
      if (w.nonEmpty) {
        words += 1
        val pieces = encode(w)
        if (pieces == null) { subs += 1; unk += 1 }
        else subs += pieces.length
      }
    }
    new GenericInternalRow(Array[Any](words, subs, unk))
  }

  /** Greedy longest-match segmentation; null when the word cannot be
    * covered (the [UNK] case). */
  def encode(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = word.length
    var i = 0
    while (i < n) {
      val prefix = if (i == 0) "" else "##"
      var j = math.min(n, i + maxPieceLen - prefix.length)
      var hit: String = null
      while (hit == null && j > i) {
        val cand = prefix + word.substring(i, j)
        if (vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) return null
      out += hit
      i = j
    }
    out.toArray
  }
}

/** Fused per-document WordPiece tokenization stats against a
  * broadcast-sized vocabulary: ONE map-only pass computing (n_words,
  * n_subwords, n_unk) — the [[BpeEncode]] shape with the greedy
  * longest-match walk in place of merge replay. */
case class WordPieceEncode(child: Expression, model: WordPieceModel)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    model.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpModel", model, classOf[WordPieceModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stats($c);")
  }

  override protected def withNewChildInternal(c: Expression): WordPieceEncode =
    copy(child = c)
}

object WordPieceEncode {
  def apply(text: Column, model: WordPieceModel): Column =
    GraftBridge.column(WordPieceEncode(GraftBridge.expression(text), model))
}
