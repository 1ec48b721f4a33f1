package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** A driver-sized reference table of vectors (ids + embeddings +
  * precomputed norms) that rides into [[ArgmaxCosine]] like a literal
  * — the broadcast-model pattern of [[BpeModel]]/[[BigramModel]],
  * applied to an eval suite. */
final class EvalMatrix(val ids: Array[Long],
                       val vecs: Array[Array[Double]]) extends Serializable {
  require(ids.length == vecs.length && ids.nonEmpty,
    "EvalMatrix must be non-empty with one id per vector")
  /** Every eval vector must share one dimensionality; a document of a
    * different width is a corpus/eval mismatch and fails fast below
    * rather than silently deflating similarities. */
  val dim: Int = vecs(0).length
  require(vecs.forall(_.length == dim),
    s"EvalMatrix vectors must all have dimension $dim")
  val norms: Array[Double] = vecs.map { v =>
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** Best match of one document vector: (eval_id, cosine). The scan
    * order is ascending id-INDEX with strict >, so ties at the max
    * break to the earliest (= smallest, when ids are sorted) id —
    * construct via [[EvalMatrix.fromSorted]] to guarantee that.
    * Zero-norm pairs score a DEFINED 0 (see SemDecontaminate). */
  def best(doc: ArrayData): GenericInternalRow = {
    val n = doc.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"document embedding has $n elements but the eval matrix is $dim-dimensional")
    // copy + norm ONCE per document (both invariant across the j-loop;
    // the copy also swaps ArrayData virtual-call reads for flat-array
    // reads in the hot dot-product loop)
    val d = new Array[Double](n)
    var dn = 0.0
    var i = 0
    while (i < n) {
      // a null ELEMENT would read as 0.0f and silently deflate the
      // similarity (the missed-contamination failure this kernel's
      // guards exist to prevent); the check rides the one-time copy
      // loop, not the per-eval dot-product loop
      if (doc.isNullAt(i))
        throw new IllegalArgumentException(
          s"document embedding has a null element at index $i")
      val x = doc.getFloat(i).toDouble
      d(i) = x; dn += x * x; i += 1
    }
    val docNorm = math.sqrt(dn)
    var bi = 0
    var bs = Double.NegativeInfinity
    var j = 0
    while (j < vecs.length) {
      val v = vecs(j)
      var s = 0.0
      i = 0
      while (i < n) { s += d(i) * v(i); i += 1 }
      val denom = docNorm * norms(j)
      val sim = if (denom > 0.0) s / denom else 0.0
      if (sim > bs) { bs = sim; bi = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](ids(bi), bs))
  }
}

object EvalMatrix {
  /** Sort by id so the strict-> scan's tie-break is smallest-id. */
  def fromSorted(rows: Seq[(Long, Array[Double])]): EvalMatrix = {
    val sorted = rows.sortBy(_._1)
    new EvalMatrix(sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }
}

/** Map-only best-eval-match: (eval_id, sim) per document embedding
  * against a broadcast-sized eval matrix — ONE expression per corpus
  * row, NO row amplification. The crossJoin formulation materializes
  * |corpus| x |eval| rows before its aggregate; at 100 TB that is a
  * three-orders-of-magnitude row blowup for the map-side combine to
  * chew back down, where this kernel emits exactly one row per doc. */
case class ArgmaxCosine(child: Expression, matrix: EvalMatrix)
  extends UnaryExpression {

  // declared rather than assumed: a non-float[] child fails ANALYSIS
  // with a type error instead of a runtime ClassCastException
  // (checkInputDataTypes directly — ExpectsInputTypes needs the
  // private[sql] AbstractDataType, see HammingDistance)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ArgmaxCosine requires an array<float> embedding, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("eval_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    matrix.best(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("evalMatrix", matrix, classOf[EvalMatrix].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.best($c);")
  }

  override protected def withNewChildInternal(c: Expression): ArgmaxCosine =
    copy(child = c)
}

object ArgmaxCosine {
  def apply(emb: Column, matrix: EvalMatrix): Column =
    GraftBridge.column(ArgmaxCosine(GraftBridge.expression(emb), matrix))
}
