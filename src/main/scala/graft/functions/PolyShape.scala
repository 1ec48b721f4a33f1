package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Polygon shape descriptors of a cell ROI outline in ONE fused pass:
  * shoelace area, perimeter, and the bounding box extrema, over an
  * `array<struct<x double, y double>>` vertex column.
  *
  * This is the codec-free core of the reference's static shape
  * features: parse_xml.py:90-101 materialises per-spot ROI coordinate
  * arrays and bin/frame_features_image.py:34-66 derives its
  * STATIC_FEATURE_NAMES from them — given the coordinates, the
  * geometry is pure arithmetic, no image decode involved.
  *
  * The composable formulation (aggregate/zip_with over shifted copies
  * of the array) is interpreted and allocates per-row intermediates;
  * this expression is one codegen'd loop via a static kernel.
  * Summation is left-to-right from 0.0 — bit-identical to the DuckDB
  * oracle's `list_sum(list_transform(...))` over the same vertices.
  * Derived descriptors (circularity, bbox aspect) are plain column
  * arithmetic on this struct — see `operators.RoiShape`.
  */
case class PolygonShape(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("area", DoubleType, nullable = false),
    StructField("perimeter", DoubleType, nullable = false),
    StructField("min_x", DoubleType, nullable = false),
    StructField("max_x", DoubleType, nullable = false),
    StructField("min_y", DoubleType, nullable = false),
    StructField("max_y", DoubleType, nullable = false),
    StructField("hull_area", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PolygonShape.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PolygonShape.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(c: Expression): PolygonShape = copy(child = c)
}

object PolygonShape {
  def apply(roi: Column): Column =
    GraftBridge.column(PolygonShape(GraftBridge.expression(roi)))

  /** Static kernel (called from generated code). Vertices are
    * struct<x,y> rows; the closing edge (last -> first) is implicit.
    * Returns null for an empty vertex array. */
  def compute(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    if (m == 0) return null
    val xs = new Array[Double](m)
    val ys = new Array[Double](m)
    var i = 0
    while (i < m) {
      val v = arr.getStruct(i, 2)
      xs(i) = v.getDouble(0)
      ys(i) = v.getDouble(1)
      i += 1
    }
    var shoelace = 0.0
    var perim = 0.0
    var minX = xs(0); var maxX = xs(0)
    var minY = ys(0); var maxY = ys(0)
    i = 0
    while (i < m) {
      val j = if (i + 1 == m) 0 else i + 1
      shoelace += xs(i) * ys(j) - xs(j) * ys(i)
      val dx = xs(j) - xs(i)
      val dy = ys(j) - ys(i)
      perim += math.sqrt(dx * dx + dy * dy)
      if (xs(i) < minX) minX = xs(i)
      if (xs(i) > maxX) maxX = xs(i)
      if (ys(i) < minY) minY = ys(i)
      if (ys(i) > maxY) maxY = ys(i)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      math.abs(shoelace) / 2.0, perim, minX, maxX, minY, maxY,
      hullArea(xs, ys)))
  }

  /** Convex-hull area (Andrew monotone chain + shoelace) — the
    * denominator of TrackMate's SOLIDITY (Spot2DShapeAnalyzer:
    * solidity = area / convex area). 0.0 for degenerate (collinear)
    * vertex sets. O(n log n) on the ROI's vertex count — outline
    * polygons are tens-to-hundreds of points. */
  private def hullArea(xs: Array[Double], ys: Array[Double]): Double = {
    val n = xs.length
    if (n < 3) return 0.0
    val idx = Array.range(0, n).sortBy(i => (xs(i), ys(i)))
    def cross(o: Int, a: Int, b: Int): Double =
      (xs(a) - xs(o)) * (ys(b) - ys(o)) - (ys(a) - ys(o)) * (xs(b) - xs(o))
    val hull = new Array[Int](2 * n)
    var k = 0
    var i = 0
    while (i < n) { // lower hull
      while (k >= 2 && cross(hull(k - 2), hull(k - 1), idx(i)) <= 0) k -= 1
      hull(k) = idx(i); k += 1; i += 1
    }
    val lower = k + 1
    i = n - 2
    while (i >= 0) { // upper hull
      while (k >= lower && cross(hull(k - 2), hull(k - 1), idx(i)) <= 0) k -= 1
      hull(k) = idx(i); k += 1; i -= 1
    }
    val m = k - 1 // last point == first
    if (m < 3) return 0.0
    var s = 0.0
    i = 0
    while (i < m) {
      val j = if (i + 1 == m) 0 else i + 1
      s += xs(hull(i)) * ys(hull(j)) - xs(hull(j)) * ys(hull(i))
      i += 1
    }
    math.abs(s) / 2.0
  }
}
