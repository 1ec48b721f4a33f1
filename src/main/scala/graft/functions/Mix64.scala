package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** The public splitmix64 finalizer (Steele et al., "Fast splittable
  * pseudorandom number generators", the java.util.SplittableRandom
  * mixer) over a long input, right-shifted one bit so the result is a
  * NON-NEGATIVE 63-bit value both engines can hold: JVM longs wrap
  * multiplication silently here, and the DuckDB oracle replays the
  * identical arithmetic in HUGEINT with 32-bit-split multiplies.
  *
  * This is the engine's deterministic SHUFFLE key: unlike the Lehmer
  * step (linear in the id — consecutive ids stay neighbours under it,
  * which ShuffleSpec proves is fatal for ordering), the finalizer
  * avalanches, so sorting by Mix64(id) is a pseudo-random permutation
  * of the corpus. Codegen'd via a static call; ANSI overflow semantics
  * never see the wrapping multiplies because they happen in Java. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Mix64.compute(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Mix64.compute($c);")
  override protected def withNewChildInternal(c: Expression): Mix64 = copy(child = c)
}

object Mix64 {
  def apply(id: Column): Column =
    GraftBridge.column(Mix64(GraftBridge.expression(id)))

  def compute(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z >>> 1
  }
}
