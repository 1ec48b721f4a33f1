package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the general form of TrackMate's
  * lineage-graph track assignment (reference: bin/parse_xml.py:120-168
  * walks the spot graph recursively on one machine; that caps at
  * driver memory). This is the alternating large-star/small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond"): converges in O(log n) rounds of DataFrame joins, each
  * round a shuffle on node id; localCheckpoint truncates lineage
  * between rounds.
  *
  * Input: undirected edges (src, dst) as longs. Output: (node,
  * component) where component = min node id in the component.
  */
object ConnectedComponents {

  /** large-star: connect every neighbour larger than u to u's minimum
    * neighbourhood label (keeps all edges, shrinks long chains). */
  private def largeStar(e: DataFrame): DataFrame = {
    val both = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
    val m = both.groupBy("u").agg(min(col("v")).as("_mn"))
      .select(col("u"), least(col("u"), col("_mn")).as("m"))
    both.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      // dedupe before smallStar: hub nodes in the bipartite graphs this
      // serves generate many duplicate (v, m) pairs per round
      .distinct()
  }

  /** small-star: point every smaller neighbour (and u) at the minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
    val m = oriented.groupBy("u").agg(min(col("v")).as("m"))
    val relinked = oriented.join(m, "u")
      .select(col("v").as("src"), col("m").as("dst"))
      .union(m.select(col("u").as("src"), col("m").as("dst")))
    relinked.filter(col("src") =!= col("dst")).distinct()
  }

  /** Run to convergence; returns (node, component). Each round the plan
    * is truncated by re-rooting on a persisted RDD (a round's plan
    * references its input several times, so without truncation the
    * logical plan — and Catalyst's optimization time — grows
    * geometrically). The previous round's blocks are freed explicitly so
    * repeated invocations don't churn executor memory. */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    // InternalRow truncation: UnsafeRows are reused by the scanner, so
    // copy before persisting (same trick localCheckpoint uses), but keep
    // the block lifecycle in our hands.
    def materialize(df: DataFrame)
        : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
      val rdd = df.queryExecution.toRdd.map(_.copy()).persist(lvl)
      (org.apache.spark.sql.GraftBridge.internalDF(spark, rdd, df.schema), rdd)
    }

    var (e, eRdd) = materialize(
      edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()) // raw edge lists (e.g. order-part lines) carry duplicates
    // convergence: edge set stable. Order-independent, overflow-free
    // signature: count + xor of edge hashes (edges are distinct). The
    // previous round's signature is carried over, not recomputed.
    def signature(df: DataFrame) =
      df.agg(count(lit(1)), expr("bit_xor(xxhash64(src, dst))")).head()
    var prevSig = signature(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val (next, nextRdd) = materialize(smallStar(largeStar(e)))
      val sig = signature(next) // materializes `next`
      eRdd.unpersist(blocking = false)
      converged = sig == prevSig
      prevSig = sig
      e = next
      eRdd = nextRdd
      i += 1
    }
    // final state is a star graph: src -> component root (dst); roots
    // themselves appear only as dst
    val members = e.select(col("src").as("node"), col("dst").as("component"))
    val roots = e.select(col("dst").as("node")).distinct()
      .join(members.select(col("node")), Seq("node"), "left_anti")
      .withColumn("component", col("node"))
    members.union(roots)
  }
}
