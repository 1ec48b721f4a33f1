package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k universal-hash permutations of one 64-bit hash:
  * perm_i(h) = a_i * h + b_i with wrapping 64-bit arithmetic (a_i odd).
  *
  * The composable alternative — k seeded `xxhash64(shingle, i)` calls —
  * rehashes the string k times per row; this computes ONE string hash
  * upstream and k long multiplications here. ANSI SQL arithmetic would
  * reject the intentional overflow; a custom Expression is the
  * Spark-native escape hatch. Deterministic (fixed golden-ratio
  * coefficients), so signatures are stable across runs/partitionings.
  */
case class MinHashPerms(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)

  private val as: Array[Long] =
    Array.tabulate(k)(i => (0x9e3779b97f4a7c15L * (2L * i + 1)) | 1L)
  private val bs: Array[Long] =
    Array.tabulate(k)(i => 0xc2b2ae3d27d4eb4fL * (i + 1))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = as(i) * h + bs(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashPerms = copy(child = c)
}

object MinHashPerms {
  def apply(hash: Column, k: Int): Column =
    GraftBridge.column(MinHashPerms(GraftBridge.expression(hash), k))
}
