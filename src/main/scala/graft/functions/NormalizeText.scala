package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the cleanup pass every corpus build
  * runs before hashing or tokenizing, as ONE codegen'd kernel:
  *
  *  1. NFC normalization (canonical composition — "e" + COMBINING
  *     ACUTE becomes the single é codepoint), so byte-level dedup
  *     hashes and shingles see one spelling per canonical string;
  *  2. control characters stripped (C0 except \n and \t, plus DEL) —
  *     the terminal-garbage class the encoding gate flags;
  *  3. horizontal whitespace runs ([ \t]+) collapsed to one space;
  *  4. leading/trailing spaces trimmed.
  *
  * NFC (not NFKC) is deliberate: canonical equivalence is
  * information-preserving and every conformant implementation agrees
  * on it — which is what makes this operator EXACTLY replayable in
  * the DuckDB oracle via its nfc_normalize. Compatibility folding
  * (width forms, ligatures) changes meaning-adjacent distinctions and
  * stays a caller decision upstream. */
object NormalizeText {

  private val Collapse = java.util.regex.Pattern.compile("[ \\t]+")

  /** Static kernel (called from generated code). */
  def clean(input: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      input.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      val ctl = (c < 0x20 && c != '\n' && c != '\t') || c == 0x7f
      if (!ctl) sb.append(c)
      i += 1
    }
    val collapsed = Collapse.matcher(sb).replaceAll(" ")
    var from = 0
    var to = collapsed.length
    while (from < to && collapsed.charAt(from) == ' ') from += 1
    while (to > from && collapsed.charAt(to - 1) == ' ') to -= 1
    UTF8String.fromString(collapsed.substring(from, to))
  }
}

/** The column expression over [[NormalizeText.clean]]. */
case class NfcClean(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeText.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.clean($c);")

  override protected def withNewChildInternal(c: Expression): NfcClean =
    copy(child = c)
}

object NfcClean {
  def apply(text: Column): Column =
    GraftBridge.column(NfcClean(GraftBridge.expression(text)))
}
