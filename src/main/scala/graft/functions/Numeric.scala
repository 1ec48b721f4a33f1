package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity-safe numeric aggregation helpers.
  *
  * Floating-point sums are order-dependent, and Spark's partial
  * aggregation order differs from any other engine's. For hash-exact
  * cross-engine comparison (and run-to-run determinism at 100 TB, where
  * partitioning varies), we sum in exact decimal space and convert the
  * final value to double: per-row doubles are bit-identical across
  * engines, the decimal cast rounds identically (HALF_UP), decimal
  * addition is exact, and decimal->double conversion is
  * round-to-nearest in both engines.
  */
object Numeric {
  /** Order-independent SUM(x) as double, exact to `scale` decimals. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Cross-engine-identical rounding of a NON-NEGATIVE double:
    * floor(x*10^r + 0.5)/10^r in pure IEEE ops. Engine-native round()
    * disagrees across engines on boundary values (Spark rounds the
    * shortest decimal representation of the double, DuckDB rounds in
    * binary), and derived values like mean-of-2 or linear interpolation
    * between 2-decimal inputs land on boundaries constantly. The SQL
    * mirror is `floor(x*1eR + 0.5)/1eR`. */
  def cround(c: Column, r: Int): Column = {
    val p = math.pow(10.0, r)
    floor(c * p + lit(0.5)) / p
  }

  /** Scalar twin of [[cround]] for imperative kernels (streaming state
    * machines, per-group solvers) — the ONE encoding of the
    * cross-engine rounding contract, so Column and scalar paths cannot
    * drift. */
  def croundD(x: Double, r: Int): Double = {
    val p = math.pow(10.0, r)
    math.floor(x * p + 0.5) / p
  }

  /** Order-independent AVG(x) as double, rounded to `r` places. */
  def davg(c: Column, scale: Int = 4, r: Int = 4): Column =
    cround(dsum(c, scale) / count(lit(1)), r)

  /** Order-independent sample standard deviation, rounded; NULL for
    * single-row groups (ANSI mode throws on the n-1=0 divisor). */
  def dstddev(c: Column, scale: Int = 4, r: Int = 4): Column = {
    val n  = count(lit(1)).cast("double")
    val s  = dsum(c, scale)
    val s2 = dsum(c * c, scale + 4)
    when(count(lit(1)) > 1, cround(sqrt((s2 - s * s / n) / (n - lit(1.0))), r))
      .otherwise(lit(null).cast("double"))
  }

  /** Epoch seconds, truncating (matches DuckDB `epoch_us(ts)//1000000`). */
  def epochSec(ts: Column): Column = unix_timestamp(ts)
}
