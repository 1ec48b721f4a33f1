package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-repetition counters for one document in ONE fused pass — what
  * `TextFeatures.repetition` (the Gopher-style repetitious-text rules)
  * needs. All outputs are per-document functions of the token sequence,
  * so nothing has to leave the row:
  *
  *  - `n_tokens`    — elements of `split(text, "\\s+")` (Java limit -1
  *    semantics, identical to Spark `split` and DuckDB
  *    `string_split_regex`).
  *  - `n_distinct`  — distinct tokens (dup-word-fraction numerator
  *    complement).
  *  - `max_run`     — longest run of one repeated consecutive token.
  *  - `n_2grams`    — adjacent token pairs (= n_tokens - 1).
  *  - `top2gram_n`  — occurrences of the most frequent 2-gram.
  *
  * The previous formulation exploded the corpus to token grain and
  * re-grouped it by document — a full token-level shuffle (plus a
  * window pass) that was a top-3 bench query locally and a
  * scale-killer at 100 TB. This kernel keeps the whole computation
  * inside the scan: map-only, no Exchange anywhere in the plan.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false),
    StructField("n_2grams", LongType, nullable = false),
    StructField("top2gram_n", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($c);")

  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
}

object RepetitionStats {
  def apply(text: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(text)))

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Static kernel (called from generated code). Per-document hash
    * state is bounded by document length, not corpus size. */
  def compute(text: UTF8String): InternalRow = {
    val toks = Ws.split(text.toString, -1)
    val n = toks.length
    val seen = new java.util.HashSet[String](math.min(2 * n, 1024))
    seen.add(toks(0))
    val grams = new java.util.HashMap[String, java.lang.Long](math.min(2 * n, 1024))
    var maxRun = 1L
    var run = 1L
    var i = 1
    while (i < n) {
      if (toks(i) == toks(i - 1)) {
        run += 1
        if (run > maxRun) maxRun = run
      } else run = 1
      seen.add(toks(i))
      val g = toks(i - 1) + " " + toks(i)
      grams.put(g, grams.getOrDefault(g, 0L) + 1L)
      i += 1
    }
    var top = 0L
    val it = grams.values().iterator()
    while (it.hasNext) {
      val v = it.next().longValue()
      if (v > top) top = v
    }
    new GenericInternalRow(Array[Any](
      n.toLong, seen.size.toLong, maxRun, (n - 1).toLong, top))
  }
}
