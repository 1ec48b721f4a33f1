package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-bigram counts in ONE fused pass — the
  * (bigram, count) multiset `TextFeatures.charBigramEntropy` explodes.
  * Input is the ALREADY-NORMALIZED text (lowercase alphanumerics,
  * space, '#'); normalization stays in Catalyst (`lower` +
  * `regexp_replace`), where full-Unicode case mapping matches the
  * DuckDB oracle — the kernel only ever sees ASCII.
  *
  * Bigrams are emitted as INT codes (c1 << 16 | c2 over UTF-16 units —
  * bijective with the 2-char strings on the post-normalization
  * alphabet): the code never leaves the engine (model keys and join
  * keys only; the oracle's bigram strings aggregate identically), and
  * the int representation cuts per-gram allocation, row width and join
  * hashing vs 2-char strings.
  *
  * The composable formulation exploded a per-row
  * `transform(sequence(...), substring)` at CHARACTER grain — an
  * interpreted higher-order function building a len-1 element array
  * per document, evaluated twice (model pass + scoring pass). This
  * kernel emits one array of distinct (bg, k) pairs per document —
  * ~5-10x fewer exploded rows, no interpreted HOF. */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bg", IntegerType, nullable = false),
    StructField("k", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BigramCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BigramCounts.compute($c);")

  override protected def withNewChildInternal(c: Expression): BigramCounts = copy(child = c)
}

object BigramCounts {
  def apply(normalizedText: Column): Column =
    GraftBridge.column(BigramCounts(GraftBridge.expression(normalizedText)))

  /** Static kernel (called from generated code). */
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val n = s.length
    val counts = new java.util.LinkedHashMap[Integer, Long]()
    var i = 0
    while (i < n - 1) {
      val bg = Integer.valueOf((s.charAt(i) << 16) | s.charAt(i + 1))
      counts.put(bg, counts.getOrDefault(bg, 0L) + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](
        e.getKey.intValue(), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }
}
