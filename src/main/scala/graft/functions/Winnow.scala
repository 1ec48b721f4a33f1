package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * scheme): hash every k-gram of characters (polynomial hash mod 1e9+7,
  * same family as PolyFingerprint so the DuckDB oracle can replicate it
  * with list lambdas), then keep the minimum hash of every sliding
  * window of `w` consecutive k-grams. Guarantees shared fingerprints
  * for any shared substring of length >= w + k - 1 — the standard
  * containment/plagiarism detector for big corpora. Returns the sorted
  * distinct fingerprint set; one pass per row, codegen'd.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.compute($c, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Winnow = copy(child = c)
}

object Winnow {
  def apply(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(Winnow(GraftBridge.expression(text), k, w))

  /** Static winnowing (called from generated code). Matches the oracle:
    * gram hash h_i = polyhash(substr(text, i, k)); fingerprint set =
    * distinct { min(h_i..h_{i+w-1}) } over all full windows, sorted. */
  def compute(input: UTF8String, k: Int, w: Int): ArrayData = {
    val s = input.toString
    val nGrams = s.length - k + 1
    if (nGrams < w) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var j = 0
      while (j < k) {
        h = (h * 31 + s.codePointAt(i + j)) % PolyHashing.P
        j += 1
      }
      hs(i) = h
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + w <= nGrams) {
      var m = hs(start)
      var t = start + 1
      while (t < start + w) { if (hs(t) < m) m = hs(t); t += 1 }
      out.add(m)
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }
}
