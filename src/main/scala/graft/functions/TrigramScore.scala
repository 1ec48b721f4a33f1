package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Sorted-array trigram -> log-prob table for [[TrigramScore]] — the
  * order-3 sibling of [[BigramModel]]: parallel arrays (long codes
  * ascending) looked up by binary search, serializable so the model
  * rides into the plan like a literal (≤39³ entries — driver-sized by
  * the normalization alphabet at any corpus scale). The per-document
  * sum replicates `sum(cast(k*lp as decimal(28,8)))` bit-for-bit
  * exactly as BigramModel.score does. */
final class TrigramModel(val codes: Array[Long], val lps: Array[Double],
                         val unseenLp: Double)
  extends Serializable {

  /** Strict mode: an unseen gram throws (the self-trained parity path —
    * scoring the exact corpus the model was trained on, where a miss is
    * a bug, not data). */
  def this(codes: Array[Long], lps: Array[Double]) =
    this(codes, lps, Double.NaN)

  def score(arr: ArrayData): GenericInternalRow = {
    var n = 0L
    var sq8 = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      val row = arr.getStruct(i, 2)
      val tg = row.getLong(0)
      val k = row.getLong(1)
      val j = java.util.Arrays.binarySearch(codes, tg)
      val lp =
        if (j >= 0) lps(j)
        else if (!java.lang.Double.isNaN(unseenLp)) unseenLp
        else throw new IllegalStateException(
          s"trigram $tg not in the corpus-trained model (model/corpus mismatch)")
      val klp = k * lp
      sq8 += new java.math.BigDecimal(java.lang.Double.toString(klp))
        .setScale(8, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      n += k
      i += 1
    }
    val sum = new java.math.BigDecimal(java.math.BigInteger.valueOf(sq8), 8)
      .doubleValue()
    new GenericInternalRow(Array[Any](n, sum))
  }
}

/** Fused per-document scoring against a broadcast-sized trigram model:
  * consumes [[TrigramCounts]]' (tg, k) array and returns
  * (n_trigrams, Σ k·logprob) in one map-only pass. */
case class TrigramScore(child: Expression, model: TrigramModel)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("lp", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    model.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramModel", model,
      classOf[TrigramModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(c: Expression): TrigramScore =
    copy(child = c)
}

object TrigramScore {
  def apply(gramArray: Column, model: TrigramModel): Column =
    GraftBridge.column(TrigramScore(GraftBridge.expression(gramArray), model))
}
