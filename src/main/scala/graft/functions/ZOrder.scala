package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Two-dimensional Z-order (Morton) key: the bits of the two inputs'
  * lower 32 bits interleaved (left takes the even bit positions).
  * Sorting by this key clusters rows that are close in BOTH
  * dimensions into the same neighborhood of the sort order — the
  * multi-dimensional data-skipping layout (Delta/Iceberg's OPTIMIZE
  * ZORDER BY): after a Z-ordered write, every file's min/max range is
  * narrow in EVERY keyed dimension, so a filter on any of them prunes
  * files/row-groups, where a lexicographic sort clusters only its
  * leading column.
  *
  * Inputs are taken modulo 2^32 (the documented key domain: ids,
  * bucketed timestamps, quantized coordinates — callers quantize
  * wider domains first, the standard z-order practice). */
case class ZOrder2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder2.interleave($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
}

object ZOrder2 {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(ZOrder2(
      GraftBridge.expression(a.cast("long")),
      GraftBridge.expression(b.cast("long"))))

  /** Spread the lower 32 bits of `v` to the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Static kernel (called from generated code). */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}
