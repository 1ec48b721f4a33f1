package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Line/paragraph duplication counters for one document in ONE fused
  * pass: lines are `\n`-separated, paragraphs are separated by runs of
  * two or more `\n`, and whitespace-only entries are ignored. Counts
  * (total, distinct, total chars, chars of distinct set) feed the
  * Gopher-style duplicate-line/paragraph fractions derived in
  * `TextFeatures.lineRepetition`.
  *
  * The composable formulation (split + filter + array_distinct + two
  * aggregate folds, per level) is interpreted — five HOF passes per
  * row made the line-repetition query the slowest in the whole bench
  * (15 s at sf0.1). This kernel is one scan per document with two hash
  * sets, codegen'd like the other text expressions.
  */
case class LineStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_distinct_lines", IntegerType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("distinct_line_chars", LongType, nullable = false),
    StructField("n_paras", IntegerType, nullable = false),
    StructField("n_distinct_paras", IntegerType, nullable = false),
    StructField("para_chars", LongType, nullable = false),
    StructField("distinct_para_chars", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    LineStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LineStats.compute($c);")

  override protected def withNewChildInternal(c: Expression): LineStats = copy(child = c)
}

object LineStats {
  def apply(text: Column): Column =
    GraftBridge.column(LineStats(GraftBridge.expression(text)))

  private def isBlank(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != ' ' && c != '\t' && c != '\n' && c != '\u000B' && c != '\f' && c != '\r')
        return false
      i += 1
    }
    true
  }

  /** Code points, not UTF-16 units: Spark's length() and DuckDB's
    * length() both count code points, so a surrogate pair must count
    * once. Counting is O(1) for all-BMP strings (the common case). */
  private def cpCount(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** Static kernel (called from generated code). Splits on '\n' for
    * lines and on runs of >= 2 '\n' for paragraphs in one scan; char
    * counts are per CODE POINT, matching both engines' length(). */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    var nLines = 0; var nDistinctLines = 0
    var lineChars = 0L; var distinctLineChars = 0L
    var nParas = 0; var nDistinctParas = 0
    var paraChars = 0L; var distinctParaChars = 0L
    val seenLines = new java.util.HashSet[String]()
    val seenParas = new java.util.HashSet[String]()

    def addLine(l: String): Unit = if (!isBlank(l)) {
      nLines += 1
      val c = cpCount(l)
      lineChars += c
      if (seenLines.add(l)) { nDistinctLines += 1; distinctLineChars += c }
    }
    def addPara(p: String): Unit = if (!isBlank(p)) {
      nParas += 1
      val c = cpCount(p)
      paraChars += c
      if (seenParas.add(p)) { nDistinctParas += 1; distinctParaChars += c }
    }

    var lineStart = 0
    var paraStart = 0
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) == '\n') {
        addLine(s.substring(lineStart, i))
        lineStart = i + 1
        // a run of >= 2 newlines ends the current paragraph
        var j = i
        while (j + 1 < n && s.charAt(j + 1) == '\n') j += 1
        if (j > i) {
          addPara(s.substring(paraStart, i))
          paraStart = j + 1
          // consume the newline run for line splitting too (each \n
          // ends one — empty, blank — line)
          i = j
          lineStart = j + 1
        }
      }
      i += 1
    }
    if (lineStart < n) addLine(s.substring(lineStart))
    if (paraStart < n) addPara(s.substring(paraStart))

    new GenericInternalRow(Array[Any](
      nLines, nDistinctLines, lineChars, distinctLineChars,
      nParas, nDistinctParas, paraChars, distinctParaChars))
  }
}
