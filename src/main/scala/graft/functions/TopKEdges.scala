package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k edge selection with structural neighbor
  * dedup — the shuffle-shrinking aggregate for the graph-ANN loops
  * (r17, guide §2.3 "aggregate before you shuffle"): NnDescent's
  * per-round state trim and GraphSearch's per-hop beam re-selection
  * previously ran TWO keyed exchanges per round — a (id, nbr) dedup
  * aggregate, then a per-id window (or collect_list + array_sort) —
  * with the second exchange carrying every candidate row (or whole
  * per-partition candidate lists). This aggregator does both in ONE
  * groupBy(id): the buffer keeps at most `k` (nbr, sim, flag) entries
  * ordered by (sim desc, nbr asc) with at most one entry per nbr, and
  * partial aggregation collapses every map partition to ≤ k entries
  * BEFORE the exchange — the shuffle carries k-bounded buffers, never
  * the candidate set.
  *
  * EXACTNESS (what makes the bounded partial trim safe):
  *  - duplicate (id, nbr) rows carry the SAME sim by construction
  *    (both loops re-score with the identical IEEE expression, and
  *    state rows re-enter with their stored sim), so nbr-dedup with a
  *    max over equal sims is order-independent;
  *  - `flag` merges by OR. The flag=true copy of any (id, nbr) is
  *    unique across partitions in both call sites (it comes from the
  *    persisted previous state, which holds one row per (id, nbr)), so
  *    a locally trimmed copy can only lose a flag the pair would need
  *    when ≥ k better-distinct neighbors exist in that partition —
  *    which puts ≥ k better entries in the merged buffer too, i.e. the
  *    pair is out of the global top-k and its flag is never read;
  *  - trimming an entry below k locally requires k better DISTINCT
  *    neighbors locally (the buffer is deduped before it is trimmed),
  *    which implies k better distinct neighbors globally — so the
  *    merged result equals dedup-then-global-top-k exactly.
  *
  * Ordering uses Double.TotalOrdering on sim (bit-deterministic for
  * the ±0.0/NaN edge; the loops' sims are plain finite doubles).
  * Output: the ordered entry array (rank = position + 1). */
object TopKEdges {

  case class Entry(nbr: Long, sim: Double, flag: Boolean)
  case class Entries(es: Seq[Entry])

  /** (sim desc, nbr asc) — the aggregator's entry order; shared with
    * GraphSearch's driver-local walk (r18) so both paths rank
    * identically. */
  private[graft] val ord: Ordering[Entry] = Ordering.by((e: Entry) =>
    (e.sim, e.nbr))(Ordering.Tuple2(
    Ordering.Double.TotalOrdering.reverse, Ordering.Long))

  /** Dedup-then-trim — private to the aggregator until r18: the
    * driver-local walk calls it directly so its beam re-selection is
    * THE aggregator's semantics, not a reimplementation. */
  private[graft] def prune(s: Seq[Entry], k: Int): Seq[Entry] = {
    // dedup by nbr FIRST (flag-OR over equal sims), then trim — the
    // dedup-before-trim order is what the exactness argument needs.
    // Duplicates carry equal sims, so after the (sim desc, nbr) sort
    // same-nbr copies are ADJACENT: dedup is one linear merge pass
    // over the sorted array, no hash map (this prune runs once per
    // ~k reduce calls on the build's hot path — the groupBy form's
    // per-prune map allocation was measurable at sf0.1)
    val arr = s.toArray
    java.util.Arrays.sort(arr, ord)
    val out = new scala.collection.mutable.ArrayBuffer[Entry](
      math.min(arr.length, k))
    var i = 0
    while (i < arr.length && out.length < k) {
      var e = arr(i)
      var j = i + 1
      while (j < arr.length && arr(j).nbr == e.nbr) {
        if (arr(j).flag && !e.flag) e = e.copy(flag = true)
        j += 1
      }
      out += e
      i = j
    }
    out.toSeq
  }

  private class TopK(k: Int)
      extends Aggregator[(Long, Double, Boolean), Entries, Entries] {
    override def zero: Entries = Entries(Nil)
    override def reduce(b: Entries, a: (Long, Double, Boolean)): Entries = {
      val nb = Entry(a._1, a._2, a._3) +: b.es
      // amortized prune: finish prunes exactly either way
      if (nb.length >= 2 * k) Entries(prune(nb, k)) else Entries(nb)
    }
    override def merge(a: Entries, b: Entries): Entries =
      Entries(prune(a.es ++ b.es, k))
    override def finish(r: Entries): Entries = Entries(prune(r.es, k))
    override def bufferEncoder: Encoder[Entries] = Encoders.product[Entries]
    override def outputEncoder: Encoder[Entries] = Encoders.product[Entries]
  }

  /** `topK(k)(nbr, sim, flag)` → struct with `es`: array<struct<nbr,
    * sim, flag>> ordered by (sim desc, nbr), ≤ k entries, one per nbr.
    * Consume with posexplode for (rank-1, entry). */
  def apply(k: Int)(nbr: Column, sim: Column, flag: Column): Column =
    udaf(new TopK(k)).apply(nbr, sim, flag)
}
