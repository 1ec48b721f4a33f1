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

  /** Order-independent AVG(x) as double, rounded to `r` places. */
  def davg(c: Column, scale: Int = 4, r: Int = 4): Column =
    round(dsum(c, scale) / count(lit(1)), r)

  /** Order-independent sample standard deviation, rounded. */
  def dstddev(c: Column, scale: Int = 4, r: Int = 4): Column = {
    val n  = count(lit(1)).cast("double")
    val s  = dsum(c, scale)
    val s2 = dsum(c * c, scale + 4)
    round(sqrt((s2 - s * s / n) / (n - lit(1.0))), r)
  }

  /** Epoch seconds, truncating (matches DuckDB `epoch_us(ts)//1000000`). */
  def epochSec(ts: Column): Column = unix_timestamp(ts)
}
