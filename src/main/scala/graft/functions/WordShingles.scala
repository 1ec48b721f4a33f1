package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a text column in ONE pass.
  *
  * The composable formulation — `transform(sequence(...), i =>
  * concat_ws(" ", slice(split(text), i, k)))` — is semantically right
  * but slow at scale: higher-order functions are interpreted (no
  * whole-stage codegen) and the `split` is re-evaluated per reference.
  * A single custom Expression tokenises once and emits the distinct
  * shingles directly; ~5x faster per row on the documents corpus.
  * Semantics match `string_split_regex(text, '\s+')` + k-gram join with
  * single spaces (the DuckDB oracle's formulation).
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    if (toks.length < k) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i + k <= toks.length) {
        val sb = new java.lang.StringBuilder(32)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val sh = UTF8String.fromString(sb.toString)
        if (sh.numBytes() > 0) seen.add(sh)
        i += 1
      }
      new GenericArrayData(seen.toArray())
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

object WordShingles {
  def apply(text: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), k))
}
