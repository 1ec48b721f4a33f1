package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a text column in ONE pass.
  *
  * The composable formulation — `transform(sequence(...), i =>
  * concat_ws(" ", slice(split(text), i, k)))` — is semantically right
  * but slow at scale: higher-order functions are interpreted (no
  * whole-stage codegen) and the `split` is re-evaluated per reference.
  * This Expression tokenises once, emits distinct shingles directly,
  * and `doGenCode` keeps the surrounding operators inside whole-stage
  * codegen (the shingling itself is one static call per row).
  * Semantics match `string_split_regex(text, '\s+')` + k-gram join with
  * single spaces (the DuckDB oracle's formulation).
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $k);")

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

object WordShingles {
  def apply(text: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), k))

  /** Static one-pass shingle computation (called from generated code). */
  def compute(input: UTF8String, k: Int): ArrayData = {
    val toks = input.toString.split("\\s+", -1)
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
}
