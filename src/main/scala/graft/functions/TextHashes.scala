package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared polynomial hashing (h = (h*31 + codePoint) mod 1e9+7) used by
  * the fingerprint and SimHash expressions. The modulus keeps every
  * intermediate < 2^35 so the identical computation is expressible in
  * DuckDB SQL (list_reduce) for the correctness oracle — cross-engine
  * bit parity is the design constraint, not hash quality.
  */
object PolyHashing {
  val P = 1000000007L

  def hashString(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

/** Rolling polynomial fingerprint of the full text (document
  * fingerprinting for the training-data pipeline; cheap containment /
  * change detection). Codegen'd via a static call. */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PolyFingerprint.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyFingerprint.compute($c);")
  override protected def withNewChildInternal(c: Expression): PolyFingerprint = copy(child = c)
}

object PolyFingerprint {
  def apply(text: Column): Column =
    GraftBridge.column(PolyFingerprint(GraftBridge.expression(text)))

  def compute(input: UTF8String): Long = PolyHashing.hashString(input.toString)
}

/** 30-bit SimHash over whitespace tokens: token hash = polynomial hash
  * above; bit b of the fingerprint is set iff
  * sum over tokens of (2*bit_b(hash)-1) > 0. One pass per row,
  * codegen'd via a static call. */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 30)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.compute($c, $bits);")

  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
}

object SimHash {
  def apply(text: Column, bits: Int = 30): Column =
    GraftBridge.column(SimHash(GraftBridge.expression(text), bits))

  def compute(input: UTF8String, bits: Int): Long = {
    val toks = input.toString.split("\\s+", -1)
    val counts = new Array[Int](bits)
    var t = 0
    while (t < toks.length) {
      val h = PolyHashing.hashString(toks(t))
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }
}
