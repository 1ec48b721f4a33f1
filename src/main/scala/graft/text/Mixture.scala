package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture sampling — the training-data "data mixing" step
  * (Pile/DoReMi-style): given target RELATIVE weights per domain and a
  * total token budget, sample each domain at the keep-rate that
  * realizes the target mixture, never exceeding a domain's capacity.
  * Rates come from classic water-filling: domains whose allocation
  * exceeds their capacity are kept whole (rate 1) and their surplus
  * re-flows to the remaining domains by weight, in at most D rounds.
  *
  * Scale shape: the per-domain capacity aggregate is map-side-combined
  * and collapses to D rows (domain count — bounded and tiny), the
  * water-filling runs on those D numbers driver-side, and the sampling
  * itself is [[TextFeatures.sampleStratified]]'s deterministic Lehmer
  * filter — map-only, broadcast rate table, no RNG state, re-runnable
  * on any partitioning. Nothing token-grain ever shuffles.
  */
object Mixture {

  /** Water-filled keep-rates. `totals` = per-domain capacity (tokens),
    * `weights` = target relative weights (any positive scale), `budget`
    * = total tokens wanted. Domains missing from `weights` (or with
    * non-positive weight, or zero capacity) get rate 0. Each round
    * allocates the remaining budget over the still-uncapped domains by
    * normalized weight; allocations at/over capacity pin to rate 1 and
    * release the difference. Deterministic: per-round weight sums run
    * in sorted domain order. */
  def rates(totals: Map[String, Long], weights: Map[String, Double],
            budget: Double): Map[String, Double] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    var out = totals.keys.map(_ -> 0.0).toMap
    var active = totals.filter(_._2 > 0).keySet
      .filter(d => weights.getOrElse(d, 0.0) > 0)
    var remaining = budget
    var done = false
    while (!done && active.nonEmpty && remaining > 0) {
      val w = active.toSeq.sorted.map(weights).sum
      val alloc = active.iterator.map(d => d -> remaining * weights(d) / w).toMap
      val capped = active.filter(d => alloc(d) >= totals(d))
      if (capped.isEmpty) {
        out = out ++ alloc.map { case (d, a) => d -> a / totals(d) }
        done = true
      } else {
        out = out ++ capped.iterator.map(_ -> 1.0)
        remaining -= capped.toSeq.sorted.map(totals(_).toDouble).sum
        active = active -- capped
      }
    }
    out
  }

  /** Temperature-scaled mixture (the mT5/UniMax-family balancing rule):
    * target weights are the domains' OWN empirical token shares raised
    * to `alpha` in (0, 1] — alpha 1 keeps the natural mixture, alpha
    * below 1 flattens it toward uniform, boosting low-resource domains
    * without a hand-written weight table (p_d^alpha is scale-invariant
    * here because [[rates]] normalizes, so t_d^alpha is used directly).
    * Same machinery as [[sample]]: one D-row capacity aggregate,
    * driver-side water-filling (domains a flattened mixture would
    * over-draw pin to rate 1 and re-flow), then the deterministic
    * map-only Lehmer filter. alpha = 0.5 makes the weight computation
    * an IEEE-exact sqrt — bit-identical across engines, which the
    * DuckDB oracle relies on. */
  def temperatureSample(df: DataFrame, id: Column, domain: Column,
                        tokens: Column, alpha: Double,
                        budgetFraction: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(budgetFraction >= 0, s"budgetFraction must be >= 0")
    val totals = df.groupBy(domain.as("_dom")).agg(sum(tokens).as("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = totals.map { case (dm, t) =>
      dm -> (if (alpha == 0.5) math.sqrt(t.toDouble)
             else math.pow(t.toDouble, alpha)) }
    val budget = budgetFraction * totals.values.map(_.toDouble).sum
    TextFeatures.sampleStratified(df, id, domain,
      rates(totals, weights, budget), defaultRate = 0.0)
  }

  /** Sample `df` to a `budgetFraction` of its total token mass at the
    * target mixture. `tokens` must be an integral per-row token (or
    * char) count. Returns the surviving rows unchanged. */
  def sample(df: DataFrame, id: Column, domain: Column, tokens: Column,
             weights: Map[String, Double], budgetFraction: Double): DataFrame = {
    require(budgetFraction >= 0, s"budgetFraction must be >= 0")
    val totals = df.groupBy(domain.as("_dom")).agg(sum(tokens).as("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = budgetFraction * totals.values.map(_.toDouble).sum
    TextFeatures.sampleStratified(df, id, domain,
      rates(totals, weights, budget), defaultRate = 0.0)
  }
}
