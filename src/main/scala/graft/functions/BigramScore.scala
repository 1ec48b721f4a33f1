package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Sorted-array bigram -> log-prob table for [[BigramScore]]: the
  * trained model as two parallel arrays (codes ascending), looked up
  * by binary search — allocation-free, ~11 probes over a <=1.6k-entry
  * vocabulary. Serializable: rides the expression into the plan like a
  * literal (the model is driver-sized by construction — the normalized
  * alphabet caps the vocabulary at 39²). */
final class BigramModel(val codes: Array[Int], val lps: Array[Double],
                        val unseenLp: Double)
  extends Serializable {

  /** Strict mode: an unseen gram throws (the self-trained parity path —
    * scoring the exact corpus the model was trained on, where a miss is
    * a bug, not data). */
  def this(codes: Array[Int], lps: Array[Double]) =
    this(codes, lps, Double.NaN)

  /** Per-document score: n = Σk and the EXACT decimal(…,8) sum of
    * k·logprob per distinct bigram, converted to double at the end —
    * replicating `sum(cast(k*lp as decimal(28,8)))` + the final
    * decimal->double cast bit-for-bit (BigDecimal from
    * Double.toString, HALF_UP at scale 8 — the same path Spark's cast
    * takes), so the fused kernel is hash-aggregation-order-independent
    * and engine-parity-safe. */
  def score(arr: ArrayData): GenericInternalRow = {
    var n = 0L
    var sq8 = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      val row = arr.getStruct(i, 2)
      val bg = row.getInt(0)
      val k = row.getLong(1)
      val j = java.util.Arrays.binarySearch(codes, bg)
      val lp =
        if (j >= 0) lps(j)
        else if (!java.lang.Double.isNaN(unseenLp)) unseenLp
        else throw new IllegalStateException(
          s"bigram $bg not in the corpus-trained model (model/corpus mismatch)")
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

/** Fused per-document scoring against a broadcast-sized bigram model:
  * consumes [[BigramCounts]]' (bg, k) array and returns
  * (n_bigrams, Σ k·logprob) in ONE map-only pass — no explode, no
  * model join, no gram-grain re-aggregation. The log-prob sum is
  * decimal-exact at scale 8 (see [[BigramModel.score]]). */
case class BigramScore(child: Expression, model: BigramModel)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("lp", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    model.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramModel", model,
      classOf[BigramModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(c: Expression): BigramScore =
    copy(child = c)
}

object BigramScore {
  def apply(gramArray: Column, model: BigramModel): Column =
    GraftBridge.column(BigramScore(GraftBridge.expression(gramArray), model))
}
