package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Gapless ROI boundary fill — the reference's
  * `interpolate_between_points` (parse_xml.py:14-46): downstream
  * CellPhe analysis assumes the ROI outline has NO breaks, so every
  * consecutive vertex pair (and the closing last-to-first edge) is
  * connected with an integer Bresenham line, and duplicate pixels are
  * removed KEEPING FIRST OCCURRENCE ORDER (the reference's
  * np.unique-then-unsort dance). Result: an 8-connected pixel chain —
  * every consecutive output pair differs by at most 1 in each axis
  * (spec-pinned property).
  *
  * One codegen'd pass per row over the `array<struct<x double,
  * y double>>` vertex column (coordinates rounded to pixels first);
  * map-only like the rest of the shape family.
  */
case class BoundaryFill(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BoundaryFill.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BoundaryFill.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(c: Expression): BoundaryFill = copy(child = c)
}

object BoundaryFill {
  def apply(roi: Column): Column =
    GraftBridge.column(BoundaryFill(GraftBridge.expression(roi)))

  /** Static kernel (called from generated code). Returns null for an
    * empty array; a single vertex yields itself. */
  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m == 0) return null
    val xs = new Array[Long](m)
    val ys = new Array[Long](m)
    var i = 0
    while (i < m) {
      val v = arr.getStruct(i, 2)
      xs(i) = Math.round(v.getDouble(0))
      ys(i) = Math.round(v.getDouble(1))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[(Long, Long)]()
    // Bresenham from (x0,y0) to (x1,y1), both endpoints included —
    // the standard integer error-accumulation walk
    def bres(x0: Long, y0: Long, x1: Long, y1: Long): Unit = {
      var x = x0; var y = y0
      val dx = Math.abs(x1 - x0); val sx = if (x0 < x1) 1L else -1L
      val dy = -Math.abs(y1 - y0); val sy = if (y0 < y1) 1L else -1L
      var err = dx + dy
      var continue = true
      while (continue) {
        seen.add((x, y))
        if (x == x1 && y == y1) continue = false
        else {
          val e2 = 2 * err
          if (e2 >= dy) { err += dy; x += sx }
          if (e2 <= dx) { err += dx; y += sy }
        }
      }
    }
    i = 1
    while (i < m) {
      bres(xs(i - 1), ys(i - 1), xs(i), ys(i))
      i += 1
    }
    bres(xs(m - 1), ys(m - 1), xs(0), ys(0)) // close the outline
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](p._1, p._2))
      i += 1
    }
    new GenericArrayData(out)
  }
}
