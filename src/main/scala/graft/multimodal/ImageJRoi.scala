package graft.multimodal

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType}

/** ImageJ `.roi` polygon encoding — the reference's ROI output format
  * (parse_xml.py:48-66 `save_rois` writes each cell outline through
  * `roifile.ImagejRoi.frompoints` into the zip CellPhe consumes). The
  * format is ImageJ's public RoiDecoder/RoiEncoder layout: a 64-byte
  * big-endian header ("Iout" magic, version, type byte, bounding box
  * as shorts, vertex count) followed by x-then-y vertex offsets
  * relative to the box's left/top. This expression emits that payload
  * as a BINARY column from an `array<struct<x long, y long>>` outline
  * (chain: [[graft.sources.XmlIngest.rois]] ->
  * [[graft.functions.BoundaryFill]] -> this) — the multimodal
  * binary-column pattern with a REAL codec: rows are (name, payload)
  * and the zip/archive step is a sink concern
  * ([[graft.sources.Compaction]]'s territory), not an operator one.
  *
  * One codegen'd pass per row; map-only.
  */
case class ImageJRoiEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageJRoi.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.multimodal.ImageJRoi.encode($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(c: Expression): ImageJRoiEncode =
    copy(child = c)
}

object ImageJRoiEncode {
  def apply(outline: Column): Column =
    GraftBridge.column(ImageJRoiEncode(GraftBridge.expression(outline)))
}

object ImageJRoi {
  private val Version: Short = 228
  private val TypePolygon: Byte = 0

  /** Static kernel (called from generated code): the ImageJ polygon
    * `.roi` payload for an `array<struct<x long, y long>>` outline.
    * Null for an empty outline. Coordinates must fit the format's
    * 16-bit relative offsets (they do for any real image frame). */
  def encode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    if (n == 0) return null
    val xs = new Array[Long](n)
    val ys = new Array[Long](n)
    var i = 0
    var minX = Long.MaxValue; var minY = Long.MaxValue
    var maxX = Long.MinValue; var maxY = Long.MinValue
    while (i < n) {
      val v = arr.getStruct(i, 2)
      xs(i) = v.getLong(0); ys(i) = v.getLong(1)
      if (xs(i) < minX) minX = xs(i)
      if (xs(i) > maxX) maxX = xs(i)
      if (ys(i) < minY) minY = ys(i)
      if (ys(i) > maxY) maxY = ys(i)
      i += 1
    }
    val buf = java.nio.ByteBuffer.allocate(64 + 4 * n) // big-endian default
    buf.put('I'.toByte).put('o'.toByte).put('u'.toByte).put('t'.toByte)
    buf.putShort(Version)
    buf.put(TypePolygon).put(0.toByte)
    buf.putShort(minY.toShort)     // top
    buf.putShort(minX.toShort)     // left
    buf.putShort((maxY + 1).toShort) // bottom (exclusive, as ImageJ writes)
    buf.putShort((maxX + 1).toShort) // right
    buf.putShort(n.toShort)
    buf.position(64) // rest of the header is zeros for a plain polygon
    i = 0
    while (i < n) { buf.putShort((xs(i) - minX).toShort); i += 1 }
    i = 0
    while (i < n) { buf.putShort((ys(i) - minY).toShort); i += 1 }
    buf.array()
  }

  /** Decoder for the subset [[encode]] writes — the spec's round-trip
    * check (mirrors ImageJ RoiDecoder's field offsets). Returns
    * (type, top, left, bottom, right, vertices). */
  def decode(bytes: Array[Byte]): (Byte, Int, Int, Int, Int, Seq[(Long, Long)]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    require(buf.get() == 'I' && buf.get() == 'o' &&
      buf.get() == 'u' && buf.get() == 't', "not an ImageJ roi")
    require(buf.getShort() == Version, "unexpected version")
    val tpe = buf.get(); buf.get()
    val top = buf.getShort().toInt
    val left = buf.getShort().toInt
    val bottom = buf.getShort().toInt
    val right = buf.getShort().toInt
    val n = buf.getShort().toInt
    buf.position(64)
    val rx = (0 until n).map(_ => buf.getShort().toLong + left)
    val ry = (0 until n).map(_ => buf.getShort().toLong + top)
    (tpe, top, left, bottom, right, rx.zip(ry))
  }
}
