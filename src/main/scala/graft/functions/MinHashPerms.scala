package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k universal-hash permutations of one 64-bit hash:
  * perm_i(h) = a_i * h + b_i with wrapping 64-bit arithmetic (a_i odd,
  * golden-ratio derived — computed from i, no coefficient tables).
  *
  * The composable alternative — k seeded `xxhash64(shingle, i)` calls —
  * rehashes the string k times per row; this computes ONE string hash
  * upstream and k long multiplications here. ANSI SQL arithmetic would
  * reject the intentional overflow; a custom Expression with codegen is
  * the Spark-native escape hatch. Deterministic across runs and
  * partitionings.
  */
case class MinHashPerms(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashPerms.compute(input.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashPerms.compute($c, $k);")

  override protected def withNewChildInternal(c: Expression): MinHashPerms = copy(child = c)
}

object MinHashPerms {
  def apply(hash: Column, k: Int): Column =
    GraftBridge.column(MinHashPerms(GraftBridge.expression(hash), k))

  /** Static permutation array (called from generated code). */
  def compute(h: Long, k: Int): ArrayData = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = (0x9e3779b97f4a7c15L * (2L * i + 1)) | 1L
      val b = 0xc2b2ae3d27d4eb4fL * (i + 1)
      out(i) = a * h + b
      i += 1
    }
    new GenericArrayData(out)
  }
}
