package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-TRIGRAM counts in one fused pass — the
  * order-3 sibling of [[BigramCounts]] (same normalized-input
  * contract: the kernel only ever sees lowercase alphanumerics, space
  * and '#'). Trigrams are emitted as LONG codes
  * (c1 << 32 | c2 << 16 | c3 over UTF-16 units — bijective with the
  * 3-char strings), so model keys stay fixed-width primitives; the
  * 39-char alphabet caps the vocabulary at 39³ ≈ 59k entries — still
  * a driver-sized model artifact at any corpus scale. */
case class TrigramCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tg", LongType, nullable = false),
    StructField("k", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TrigramCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TrigramCounts.compute($c);")

  override protected def withNewChildInternal(c: Expression): TrigramCounts = copy(child = c)
}

object TrigramCounts {
  def apply(normalizedText: Column): Column =
    GraftBridge.column(TrigramCounts(GraftBridge.expression(normalizedText)))

  /** Static kernel (called from generated code). */
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val n = s.length
    val counts = new java.util.LinkedHashMap[java.lang.Long, Long]()
    var i = 0
    while (i < n - 2) {
      val tg = java.lang.Long.valueOf(
        (s.charAt(i).toLong << 32) | (s.charAt(i + 1).toLong << 16) | s.charAt(i + 2))
      counts.put(tg, counts.getOrDefault(tg, 0L) + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](
        e.getKey.longValue(), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }
}
