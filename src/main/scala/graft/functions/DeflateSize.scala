package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of the UTF-8 text — the compression-ratio
  * quality signal (low compressed/raw ratio = repetitive or templated
  * text, near-1 ratio = high-entropy junk like base64/binary spill;
  * corpus builds cut both tails). One pass per row, codegen'd via a
  * static call; the Deflater is thread-local (reset per row, never
  * reallocated) because instantiating a zlib stream per document would
  * dominate the kernel. Level fixed at 6 (zlib default): the count is
  * deterministic for a given zlib build, and the spec pins parity
  * against direct java.util.zip on the same strings. Raw deflate
  * (nowrap) so the 6-byte zlib header/checksum doesn't blur short-doc
  * ratios. */
case class DeflateSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    DeflateSize.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateSize.compute($c);")
  override protected def withNewChildInternal(c: Expression): DeflateSize = copy(child = c)
}

object DeflateSize {
  def apply(text: Column): Column =
    GraftBridge.column(DeflateSize(GraftBridge.expression(text)))

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  def compute(input: UTF8String): Long = {
    val bytes = input.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = bufLocal.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
