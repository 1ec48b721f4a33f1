package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Bit-level Hamming distance between two 64-bit fingerprints —
  * popcount(a XOR b). Fully codegen'd (`doGenCode` emits a single
  * `Long.bitCount` call) so SimHash near-dup verification stays inside
  * whole-stage codegen on the join hot path.
  */
// (no ExpectsInputTypes: AbstractDataType is private[sql]; the Column
// factory below casts both sides to long instead)
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}

object HammingDistance {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(HammingDistance(
      GraftBridge.expression(a.cast("long")), GraftBridge.expression(b.cast("long"))))
}
