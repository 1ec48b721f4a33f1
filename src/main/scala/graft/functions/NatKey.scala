package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Natural-sort key — the `natsorted` ordering the reference's
  * `rename_frames` applies before assigning canonical frame numbers
  * (main.nf:339-359: frames are natural-sorted by filename, then
  * renamed `frame_%05d.tiff`), re-expressed as a SORTABLE STRING so
  * the ordering runs as an ordinary (codegen'd, spillable) Spark sort
  * instead of a driver-side comparator: every maximal digit run is
  * replaced by a `\u0001` type tag followed by its value left-padded
  * with zeros to 20 characters (leading zeros stripped first, so
  * "007" == "7" as in natsort's integer parse; ties broken by the
  * caller on the raw name), and text runs pass through. Binary
  * comparison of the keys then equals natsort's TUPLE comparison:
  * "frame_9" < "frame_10" (pad makes 00…09 < 00…10), and the tag —
  * a byte below every text byte — reproduces the tuple-boundary
  * rule that a name whose text run ENDS where a sibling's continues
  * sorts first ("img2.tiff" < "img.tiff", because natsort compares
  * ("img", 2, ".tiff") against ("img.tiff",) and the shorter first
  * element wins — where an untagged pad would have let '.' < '0'
  * decide the other way). Runs past 20 significant digits keep
  * their full length — longer keys compare greater against the
  * padded width, preserving order for any realistic frame index.
  * The one ordering the tag cannot represent is a raw `\u0000` NUL
  * inside a filename (below the tag byte) — not a name any
  * filesystem produces. */
case class NaturalSortKey(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NaturalSortKey.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NaturalSortKey.compute($c)")

  override protected def withNewChildInternal(c: Expression): NaturalSortKey =
    copy(child = c)
}

object NaturalSortKey {
  val Width = 20

  /** Digit-run type tag: one byte below every text byte (UTF-8
    * multi-byte sequences start >= 0x80; ASCII text is >= 0x20 in any
    * real filename), so "digit run starts here" compares BELOW "text
    * continues here" — natsort's shorter-tuple-element-first rule. */
  val NumTag = '\u0001'

  def apply(name: Column): Column =
    GraftBridge.column(NaturalSortKey(GraftBridge.expression(name)))

  /** Static kernel (called from generated code). */
  def compute(s: UTF8String): UTF8String = {
    val in = s.toString
    val out = new java.lang.StringBuilder(in.length + Width)
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < n && in.charAt(j) >= '0' && in.charAt(j) <= '9') j += 1
        var k = i
        while (k < j - 1 && in.charAt(k) == '0') k += 1 // strip leading zeros
        out.append(NumTag)
        val digits = j - k
        var p = digits
        while (p < Width) { out.append('0'); p += 1 }
        out.append(in, k, j)
        i = j
      } else {
        out.append(c)
        i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }
}
