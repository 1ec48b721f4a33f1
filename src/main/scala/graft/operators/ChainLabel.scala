package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Head labels for DISJOINT CHAINS by pointer doubling — the
  * specialisation of connected components for graphs whose every node
  * has in-degree <= 1 and out-degree <= 1 (exactly what
  * `TrackAssignment`'s merge/split cuts leave behind, reference
  * semantics per bin/parse_xml.py:124-163: each surviving chain is one
  * track segment).
  *
  * Generic alternating-star CC is correct on chains but pays two
  * window shuffles plus a dedup per round. A chain is a linked list,
  * so the ancestor pointer suffices: after local per-partition
  * contraction (each partition walks its own child->parent map to its
  * local top — one imperative pass, memory bounded by the partition),
  * each global round substitutes every pointer with its ancestor's
  * pointer (`anc' = anc(anc)`) via ONE equi-join — doubling the
  * distance covered per round, reaching every head in O(log chain
  * length) rounds. Plans are truncated per round on persisted RDDs and
  * convergence is the same count+xor signature as
  * `ConnectedComponents` (one job per round); exceeding `maxIter`
  * throws rather than returning partial labels.
  *
  * Input: `chain` edges (src = predecessor, dst = successor), each
  * node in at most one edge per direction, acyclic. Output: (id, head)
  * for every node incident to an edge, heads included as (h, h).
  */
object ChainLabel {

  def heads(chain: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = chain.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    import spark.implicits._

    // per-partition contraction: follow parent pointers within the
    // partition's own map (memoised tops, no mutation mid-walk); local
    // sub-chains collapse before any shuffle happens
    def contractPtr(pairs: org.apache.spark.sql.Dataset[(Long, Long)]): DataFrame =
      pairs.mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        it.foreach { case (c, p) => parent.put(c, p) }
        val top = new java.util.HashMap[Long, Long]()
        val bound = parent.size() + 1
        val keys = parent.keySet().toArray(new Array[java.lang.Long](0))
        keys.iterator.map { k =>
          val path = scala.collection.mutable.ArrayBuffer[Long]()
          var x: Long = k
          var steps = 0
          while (parent.containsKey(x) && !top.containsKey(x)) {
            path += x
            x = parent.get(x)
            steps += 1
            if (steps > bound)
              throw new IllegalStateException("cycle in chain edges")
          }
          val t = top.getOrDefault(x, x)
          path.foreach(top.put(_, t))
          (k.longValue(), t)
        }
      }.toDF("id", "anc")

    val contracted = contractPtr(chain
      .select(col("dst").cast("long").as("id"), col("src").cast("long").as("anc"))
      .as[(Long, Long)])

    def signature(df: DataFrame) =
      df.agg(count(lit(1)), expr("bit_xor(xxhash64(id, anc))")).head()

    var (p, pRdd) = Rounds.materialize(contracted, lvl)
    var prevSig = signature(p)
    // adaptive small-graph collapse (same trick as ConnectedComponents):
    // the signature's count says how many pointers survived local
    // contraction. If they fit one task, a single-partition re-walk IS
    // exact head resolution for the whole residual — one pass instead
    // of O(log chain) doubling rounds. A single timelapse's chains
    // always land here; corpora of many long chains above the cutoff
    // take the doubling rounds as before.
    var converged = prevSig.getLong(0) == 0L
    if (!converged && prevSig.getLong(0) <= 500000L) {
      val (p2, p2Rdd) = Rounds.materialize(
        contractPtr(p.as[(Long, Long)].repartition(1)), lvl)
      prevSig = signature(p2)
      pRdd.unpersist(blocking = false)
      p = p2
      pRdd = p2Rdd
      converged = true
    }
    var i = 0
    while (!converged && i < maxIter) {
      val next = p.as("a")
        .join(p.select(col("id").as("_bid"), col("anc").as("_banc")),
          col("anc") === col("_bid"), "left")
        .select(col("id"), coalesce(col("_banc"), col("anc")).as("anc"))
      val (nextDF, nextRdd) = Rounds.materialize(next, lvl)
      val sig = signature(nextDF) // materializes the round
      pRdd.unpersist(blocking = false)
      converged = sig == prevSig
      prevSig = sig
      p = nextDF
      pRdd = nextRdd
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"chain labeling did not converge in $maxIter doubling rounds; " +
          "raise maxIter rather than using partial heads")

    // heads never appear as a dst, so they have no pointer row — add
    // their self-labels from the node universe
    val nodes = chain.select(col("src").cast("long").as("id"))
      .union(chain.select(col("dst").cast("long").as("id"))).distinct()
    val headSelf = nodes.join(p.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("head"))
    p.select(col("id"), col("anc").as("head")).union(headSelf)
  }
}
