package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** Deterministic synthetic ROI polygon for a (id, x, y) spot — the
  * driver-data stand-in for segmentation output (see
  * `operators.RoiShape.syntheticRoi` for the geometry rationale and
  * the DuckDB mirror): a star of k = 4 + id%5 vertices around (x, y)
  * walking the 8 compass directions with integer radius 1 + (id+i)%3.
  *
  * The composable formulation (`transform(sequence(...))` building
  * structs through element_at lookups) runs interpreted per VERTEX —
  * lambda dispatch and boxed struct allocation for every corner of
  * every ROI. This expression emits the vertex array in one codegen'd
  * kernel call; arithmetic is identical (integer-derived doubles), so
  * vertices stay bit-equal to both the HOF formulation and the oracle.
  */
case class SyntheticRoi(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false))), containsNull = false)

  override def nullSafeEval(id: Any, x: Any, y: Any): Any =
    SyntheticRoi.compute(id.asInstanceOf[Long],
      x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (i, x, y) =>
      s"${ev.value} = graft.functions.SyntheticRoi.compute($i, $x, $y);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SyntheticRoi = copy(f, s, t)
}

object SyntheticRoi {
  def apply(id: Column, x: Column, y: Column): Column =
    GraftBridge.column(SyntheticRoi(GraftBridge.expression(id.cast("long")),
      GraftBridge.expression(x.cast("double")),
      GraftBridge.expression(y.cast("double"))))

  private val dxs = Array(1.0, 1.0, 0.0, -1.0, -1.0, -1.0, 0.0, 1.0)
  private val dys = Array(0.0, 1.0, 1.0, 1.0, 0.0, -1.0, -1.0, -1.0)

  /** Static kernel (called from generated code). */
  def compute(id: Long, x: Double, y: Double): ArrayData = {
    val k = (4 + (id % 5)).toInt
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      val r = ((id + i) % 3 + 1).toDouble
      out(i) = new GenericInternalRow(Array[Any](x + dxs(i) * r, y + dys(i) * r))
      i += 1
    }
    new GenericArrayData(out)
  }
}
