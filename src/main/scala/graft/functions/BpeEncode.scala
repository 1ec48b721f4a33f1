package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained BPE model: merge ranks plus the full vocabulary (the
  * training alphabet, `</w>`, and every merge product). Driver-sized
  * by construction (numMerges + alphabet entries) and serializable,
  * so it rides into the encode expression like a literal — the
  * broadcast-model pattern of [[BigramModel]].
  *
  * Symbolization: a word becomes its code points (as strings) plus a
  * terminal `</w>` symbol; merges fuse adjacent symbols bottom-up in
  * RANK order (lowest rank first, leftmost occurrence first on ties) —
  * the standard Sennrich et al. 2016 encode. A code point absent from
  * the training alphabet can never merge, so it survives to the
  * output outside the vocabulary and is counted `unk`. */
final class BpeModel(val ranks: Map[(String, String), Int],
                     val vocab: Set[String]) extends Serializable {

  /** (n_words, n_subwords, n_unk) of a whitespace-split text. */
  def stats(text: UTF8String): GenericInternalRow = {
    var words = 0L
    var subs = 0L
    var unk = 0L
    val it = text.toString.split("\\s+").iterator
    while (it.hasNext) {
      val w = it.next()
      if (w.nonEmpty) {
        words += 1
        val syms = encode(w)
        subs += syms.length
        var i = 0
        while (i < syms.length) {
          if (!vocab.contains(syms(i))) unk += 1
          i += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](words, subs, unk))
  }

  /** BPE-encode one word into its subword symbols. */
  def encode(word: String): Array[String] = {
    var syms = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b += "</w>"
      b.result()
    }
    var done = false
    while (!done && syms.length > 1) {
      // lowest-rank adjacent pair, leftmost on rank ties
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) done = true
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, best)
        merged(best) = syms(best) + syms(best + 1)
        System.arraycopy(syms, best + 2, merged, best + 1,
          syms.length - best - 2)
        syms = merged
      }
    }
    syms
  }
}

/** Fused per-document BPE tokenization stats against a broadcast-sized
  * trained model: ONE map-only pass computing (n_words, n_subwords,
  * n_unk) — no word-grain explode, no vocab join. */
case class BpeEncode(child: Expression, model: BpeModel)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    model.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stats($c);")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

object BpeEncode {
  def apply(text: Column, model: BpeModel): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(text), model))
}
