package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Token counters for one document in ONE fused pass — the counts
  * `TextFeatures.tokenStats` needs (reference provenance: token/size
  * accounting over per-cell text-like props mirrors the corpus token
  * statistics a training pipeline keeps):
  *
  *  - `n_ws_tokens`   — elements of `split(text, "\\s+")` (Java limit
  *    -1 semantics: one more than the number of maximal whitespace
  *    runs, so leading/trailing runs contribute their empty tokens
  *    exactly like Spark's `split`).
  *  - `n_bpe_tokens`  — matches of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`
  *    (alpha runs + digit runs + every other non-whitespace char).
  *  - `n_alpha_tokens` — matches of `[A-Za-z]+`.
  *  - `n_nonws_chars` — characters left after deleting `\s` (the
  *    `avg_token_len` numerator).
  *
  * The composable formulation was three `regexp_count` passes plus a
  * `split` — four full regex scans per document that made
  * q_text_tokens one of the slowest map-only queries in the bench.
  * This kernel is a single character scan with no regex machinery.
  * `\s` means the Java/RE2 ASCII class `[ \t\n\x0B\f\r]`, matching
  * both engines' default (non-Unicode) behavior.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_ws_tokens", IntegerType, nullable = false),
    StructField("n_bpe_tokens", IntegerType, nullable = false),
    StructField("n_alpha_tokens", IntegerType, nullable = false),
    StructField("n_nonws_chars", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TokenCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCounts.compute($c);")

  override protected def withNewChildInternal(c: Expression): TokenCounts = copy(child = c)
}

object TokenCounts {
  def apply(text: Column): Column =
    GraftBridge.column(TokenCounts(GraftBridge.expression(text)))

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Static kernel (called from generated code). Char classes are
    * ASCII (both engines' regex default); iteration is by CODE POINT,
    * so a non-BMP character (emoji, astral CJK) counts as one 'other'
    * token and one non-ws char — matching the regexp_count /
    * regexp_replace formulation and the DuckDB oracle, which both
    * operate per code point (a UTF-16 `charAt` loop counted surrogate
    * pairs twice). */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var wsRuns = 0
    var alphaRuns = 0
    var digitRuns = 0
    var otherChars = 0
    var nonWs = 0L
    var prevClass = -1 // 0 = ws, 1 = alpha, 2 = digit, 3 = other
    var i = 0
    while (i < n) {
      val c = s.codePointAt(i)
      val cls =
        if (isWs(c)) 0
        else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) 1
        else if (c >= '0' && c <= '9') 2
        else 3
      if (cls == 0) { if (prevClass != 0) wsRuns += 1 }
      else {
        nonWs += 1
        if (cls == 1) { if (prevClass != 1) alphaRuns += 1 }
        else if (cls == 2) { if (prevClass != 2) digitRuns += 1 }
        else otherChars += 1
      }
      prevClass = cls
      i += Character.charCount(c)
    }
    new GenericInternalRow(Array[Any](
      wsRuns + 1, alphaRuns + digitRuns + otherChars, alphaRuns, nonWs))
  }
}
