package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** INCREMENTAL quantile artifacts — the quantile twin of the 7i2 HLL
  * sketches, completing the sketch family: each ingest batch reduces
  * to one fixed-size row per group (a bottom-`k` sample), persisted
  * next to the corpus, and any batch-range's percentiles come from a
  * UNION of its sketches — no raw-data rescan, ever.
  *
  * The sketch is the k-minimum-priority sample (the KMV/bottom-k
  * coordinated-sampling construction, Cohen & Kaplan 2007; priority
  * sampling, Duffield et al. 2005): every row gets the deterministic
  * 63-bit priority `Mix64(rowId)` and a group's sketch is its `k`
  * smallest distinct (priority, value) pairs plus the exact row count.
  * Unlike KLL/GK summaries — whose merges are order-sensitive, so two
  * merge trees over the same parts can disagree — bottom-k-distinct is
  * a JOIN-SEMILATTICE: union is associative, commutative, and
  * idempotent, so the merged sketch is BIT-EQUAL to a one-shot sketch
  * over the concatenated data regardless of batching, partitioning, or
  * replay (the exact property that makes the HLL artifacts compose
  * indefinitely, now for quantiles; QuantileSketchSpec pins it, and
  * because Mix64 replays in DuckDB HUGEINT the WHOLE incremental
  * chain is SQL-oracled — q_qsk). The estimate reads the value at the
  * integer rank `(m-1)·p/100` of the value-sorted sample: a
  * hash-random m-sample puts it within O(1/sqrt(m)) quantile rank of
  * the population quantile w.h.p. (spec-measured against the exact
  * percentile).
  *
  * Scale shape: the typed Aggregator keeps a bounded buffer (pruned at
  * 2k), so map-side partial aggregation collapses every partition to
  * one <= k-entry buffer BEFORE the exchange — the shuffle carries
  * sketch-grain rows, never values, exactly like `hll_sketch_agg`.
  * Union explodes nothing: per-part entry arrays merge array-at-a-time
  * (no row fanout, so the exact count sums stay exact). The count `n`
  * is exact under the exactly-once feed contract every artifact store
  * here assumes; the SAMPLE itself is replay-idempotent even without
  * it (distinct pairs — a replayed batch unions to the identical
  * sample). */
object QuantileSketch {

  /** One sample entry as the Aggregator sees it. */
  private type Entry = (Long, Double)
  /** Buffer/array wrapper (Encoders.product needs a case class; Seq
    * alone is not a Product). */
  case class Entries(entries: Seq[(Long, Double)])

  /** Total, explicit ordering (IEEE-ambiguity-free): the artifact
    * layout must be deterministic across Scala versions. */
  private val entryOrd: Ordering[Entry] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  private def prune(s: Seq[Entry], k: Int): Seq[Entry] = {
    val d = s.distinct.sorted(entryOrd)
    if (d.length > k) d.take(k) else d
  }

  /** Bottom-k-distinct over single (priority, value) rows. */
  private class BottomK(k: Int) extends Aggregator[Entry, Entries, Entries] {
    override def zero: Entries = Entries(Nil)
    override def reduce(b: Entries, a: Entry): Entries = {
      val nb = a +: b.entries
      // amortized prune: exact result is finish's prune either way
      if (nb.length >= 2 * k) Entries(prune(nb, k)) else Entries(nb)
    }
    override def merge(a: Entries, b: Entries): Entries =
      Entries(prune(a.entries ++ b.entries, k))
    override def finish(r: Entries): Entries = Entries(prune(r.entries, k))
    override def bufferEncoder: Encoder[Entries] = Encoders.product[Entries]
    override def outputEncoder: Encoder[Entries] = Encoders.product[Entries]
  }

  /** Bottom-k-distinct over per-part entry ARRAYS (the union side —
    * no explode, so sibling exact counts never fan out). */
  private class MergeK(k: Int) extends Aggregator[Entries, Entries, Entries] {
    override def zero: Entries = Entries(Nil)
    override def reduce(b: Entries, a: Entries): Entries =
      Entries(prune(b.entries ++ a.entries, k))
    override def merge(a: Entries, b: Entries): Entries =
      Entries(prune(a.entries ++ b.entries, k))
    override def finish(r: Entries): Entries = Entries(prune(r.entries, k))
    override def bufferEncoder: Encoder[Entries] = Encoders.product[Entries]
    override def outputEncoder: Encoder[Entries] = Encoders.product[Entries]
  }

  /** The aggregate Column for one-shot sketching — exposed so the
    * streaming windowed form can ride a plain groupBy.agg. */
  def sketchAgg(rowId: Column, v: Column, k: Int): Column = {
    // the tuple encoder flattens to TWO scalar parameters
    val f = udaf(new BottomK(k), Encoders.product[Entry])
    f(graft.functions.Mix64(rowId), v.cast("double"))
  }

  private def toNamed(c: Column): Column =
    transform(c, x => struct(x.getField("_1").as("pri"),
      x.getField("_2").as("v")))
  private def toEntries(c: Column): Column =
    transform(c, x => struct(x.getField("pri").as("_1"),
      x.getField("v").as("_2")))

  /** The union-side aggregate over named sample-array columns (the
    * persisted `smp` form), returning the same named form — exposed so
    * composed artifact stores (the incremental dataset card) can merge
    * samples inside their own one-row aggregates. Same semilattice
    * guarantee as [[unionSketches]]. */
  def unionAgg(smp: Column, k: Int): Column = {
    val m = udaf(new MergeK(k), Encoders.product[Entries])
    toNamed(m(toEntries(smp)).getField("entries"))
  }

  /** Integer-rank percentile column over a named sample array (the
    * 7i4 estimate tail, exposed for composed stores): the value at
    * rank (m-1)·p DIV 100 of the value-sorted sample. */
  def percentileOf(smp: Column, percent: Int): Column = {
    require(percent >= 0 && percent <= 100, "percent in [0,100]")
    val vs = array_sort(transform(smp, _.getField("v")))
    // floor(x/100) == x DIV 100 exactly for the non-negative,
    // double-exact ranks a <= 100-percent sample can produce
    element_at(vs,
      floor(((size(vs) - 1) * percent) / lit(100)).cast("int") + 1)
  }

  /** Per-batch sketch artifact: (keys..., n, smp) with
    * smp: array<struct<pri,v>> sorted by (pri, v), |smp| <= k, and n
    * the exact non-null-value row count. Parquet-persistable. */
  def sketchBy(df: DataFrame, keys: Seq[Column], rowId: Column, v: Column,
               k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.filter(v.isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), sketchAgg(rowId, v, k).as("_sk"))
      .withColumn("smp", toNamed(col("_sk.entries")))
      .drop("_sk")
  }

  /** Merge persisted sketches down to `keys` grain, KEEPING the
    * sketch form — same schema as [[sketchBy]] plus n_parts, so the
    * incremental chain composes indefinitely (yesterday's rollup row
    * unions with today's batch sketch into today's rollup). `k` must
    * be <= the build k (a union can only keep what its parts kept). */
  def unionSketches(sk: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    val m = udaf(new MergeK(k), Encoders.product[Entries])
    sk.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_parts"), sum(col("n")).as("n"),
        m(toEntries(col("smp"))).as("_sk"))
      .withColumn("smp", toNamed(col("_sk.entries")))
      .drop("_sk")
  }

  /** Union + estimate: (keys..., n_parts, n, m, p<P>...) where p<P>
    * is the value at integer rank (m-1)·P/100 of the value-sorted
    * merged sample (m = |sample|). Scalar columns only. */
  def estimate(sk: DataFrame, keys: Seq[String], k: Int,
               percents: Seq[Int]): DataFrame = {
    require(percents.forall(p => p >= 0 && p <= 100), "percents in [0,100]")
    val u = unionSketches(sk, keys, k)
      .withColumn("_vs", array_sort(transform(col("smp"), _.getField("v"))))
      .withColumn("m", size(col("_vs")))
    percents.foldLeft(u) { (df, p) =>
      // integer rank arithmetic (DIV, not fractional /): replayable
      df.withColumn(s"p$p",
        element_at(col("_vs"),
          expr(s"CAST(((m - 1) * $p) DIV 100 AS INT) + 1")))
    }.drop("_vs", "smp")
  }
}
