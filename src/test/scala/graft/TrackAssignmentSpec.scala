package graft

import org.apache.spark.sql.functions._
import graft.operators.TrackAssignment

/** Division-aware track assignment vs a faithful reimplementation of
  * the reference traversal (parse_xml.py:124-163): global DFS from
  * frame-ordered roots, track counter incremented at every extra child
  * of a split, merges suppressed via a traversed set. Child/root order
  * is (frame, id) — the deterministic analog of the reference's XML
  * edge order. Compared as PARTITIONS (set of node-sets): the
  * reference's sequential counter values are traversal-order
  * artifacts; which spots share a track is the semantics.
  */
class TrackAssignmentSpec extends SparkSpec {
  import spark.implicits._

  /** parse_xml.py's traverse_track, verbatim semantics. */
  private def referencePartition(frames: Map[Long, Long],
                                 edges: Seq[(Long, Long)]): Set[Set[Long]] = {
    val children = edges.groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(c => (frames(c), c)).toList).toMap
    val hasParent = edges.map(_._2).toSet
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val roots = nodes.filterNot(hasParent).sortBy(n => (frames(n), n))
    var trackId = 0
    val traversed = scala.collection.mutable.Set[Long]()
    val assign = scala.collection.mutable.Map[Long, Int]()
    def traverse(node: Long, accum: Boolean): Unit = {
      if (traversed(node)) return
      if (accum) trackId += 1
      assign(node) = trackId
      traversed += node
      for ((c, j) <- children.getOrElse(node, Nil).zipWithIndex) traverse(c, j > 0)
    }
    for ((r, i) <- roots.zipWithIndex) traverse(r, i > 0)
    assign.groupBy(_._2).values.map(_.keySet.toSet).toSet
  }

  private def graftPartition(frames: Map[Long, Long],
                             edges: Seq[(Long, Long)]): Set[Set[Long]] = {
    val spots = frames.toSeq.toDF("id", "frame")
    val ed = edges.toDF("src", "dst")
    TrackAssignment.divisionAware(spots, ed)
      .as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
  }

  private def check(frames: Map[Long, Long], edges: Seq[(Long, Long)]): Unit = {
    val exp = referencePartition(frames, edges)
    val got = graftPartition(frames, edges)
    assert(got == exp, s"partitions differ:\n got=$got\n exp=$exp")
    // the cogroup-by-video variant must agree with the iterative
    // operator EXACTLY (same labels, not just the same partition)
    val generic = TrackAssignment.divisionAware(
        frames.toSeq.toDF("id", "frame"), edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    val byVideo = TrackAssignment.divisionAwareByVideo(
        frames.toSeq.toDF("id", "frame"), edges.toDF("src", "dst"), _ => 0L)
      .as[(Long, Long)].collect().toSet
    assert(byVideo == generic, s"byVideo diverged:\n got=$byVideo\n exp=$generic")
  }

  test("byVideo: videos are labeled independently and identically") {
    // two copies of one division tree in disjoint id blocks = 2 videos
    val frames0 = Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L)
    val edges0 = Seq((1L, 2L), (1L, 3L), (2L, 4L))
    val frames = frames0.map { case (k, v) => (k, v) } ++
      frames0.map { case (k, v) => (k + 100L, v) }
    val edges = edges0 ++ edges0.map { case (s, d) => (s + 100L, d + 100L) }
    val got = TrackAssignment.divisionAwareByVideo(
        frames.toSeq.toDF("id", "frame"), edges.toDF("src", "dst"), _ / 100L)
      .as[(Long, Long)].collect().toSet
    val generic = TrackAssignment.divisionAware(
        frames.toSeq.toDF("id", "frame"), edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(got == generic)
    // second video's labels are the first's shifted by the id offset
    val v0 = got.filter(_._1 < 100L).map { case (i, t) => (i + 100L, t + 100L) }
    assert(got.filter(_._1 >= 100L) == v0)
  }

  test("linear chain is one track") {
    check(Map(1L -> 0L, 2L -> 1L, 3L -> 2L), Seq((1L, 2L), (2L, 3L)))
  }

  test("division: first child continues, extra child starts a new track") {
    // 1 -> 2 -> 3 splits into {4 (first), 5}; each continues one more
    val frames = Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 3L, 6L -> 4L, 7L -> 4L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 6L), (5L, 7L))
    val exp = Set(Set(1L, 2L, 3L, 4L, 6L), Set(5L, 7L))
    assert(referencePartition(frames, edges) == exp)
    check(frames, edges)
  }

  test("two-generation division tree") {
    // root splits; both daughters split again -> 4 tracks
    val frames = Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 2L)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (3L, 6L), (3L, 7L))
    val exp = Set(Set(1L, 2L, 4L), Set(5L), Set(3L, 6L), Set(7L))
    assert(referencePartition(frames, edges) == exp)
    check(frames, edges)
  }

  test("shortcut merge: chain claims the rejoining node, spur track ends") {
    // 1 -> 2 -> 3 and a shortcut 1 -> 3: DFS claims 3 via 2 (the later
    // parent), the direct edge is suppressed -> one single track
    val frames = Map(1L -> 0L, 2L -> 1L, 3L -> 2L)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(referencePartition(frames, edges) == Set(Set(1L, 2L, 3L)))
    check(frames, edges)
  }

  test("merge of two independent chains: merging chain ends at the merge") {
    // both parents at the same frame -> min-id parent claims; the
    // reference DFS (roots frame-ordered, then id) claims via the same
    // parent, so partitions coincide
    val frames = Map(1L -> 0L, 2L -> 1L, 10L -> 0L, 11L -> 1L, 5L -> 2L, 6L -> 3L)
    val edges = Seq((1L, 2L), (2L, 5L), (10L, 11L), (11L, 5L), (5L, 6L))
    val exp = Set(Set(1L, 2L, 5L, 6L), Set(10L, 11L))
    assert(referencePartition(frames, edges) == exp)
    check(frames, edges)
  }

  test("isolated edgeless spots are excluded (reference drops them)") {
    val frames = Map(1L -> 0L, 2L -> 1L, 99L -> 5L)
    val edges = Seq((1L, 2L))
    assert(graftPartition(frames, edges) == Set(Set(1L, 2L)))
  }

  test("random division forests (no merges) match the reference exactly") {
    // deterministic pseudo-random lineage forests: each node at frame f
    // gains 1 child (continue) or 2 (division) — the biological case
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      var nextId = 0L
      val frames = scala.collection.mutable.Map[Long, Long]()
      val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var alive = (1 to 3).map { _ => nextId += 1; frames(nextId) = 0L; nextId }
      for (f <- 1L to 12L) {
        alive = alive.flatMap { p =>
          val kids = rnd.nextInt(10) match {
            case 0 => 0 // track ends
            case n if n <= 7 => 1
            case _ => 2 // division
          }
          (1 to kids).map { _ =>
            nextId += 1; frames(nextId) = f; edges += ((p, nextId)); nextId
          }
        }
      }
      if (edges.nonEmpty) check(frames.toMap, edges.toSeq)
    }
  }
}

class ChainLabelSpec extends SparkSpec {
  import spark.implicits._

  test("hand chains: every node labeled with its chain head") {
    // chains: 5->9->2->7 (head 5), 10->11 (head 10), singleton via no edge
    val chain = Seq((5L, 9L), (9L, 2L), (2L, 7L), (10L, 11L)).toDF("src", "dst")
    val got = graft.operators.ChainLabel.heads(chain)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 9L -> 5L, 2L -> 5L, 7L -> 5L,
      10L -> 10L, 11L -> 10L))
  }

  test("pointer doubling equals generic CC partitions on random chains") {
    val rnd = new scala.util.Random(42)
    // 60 chains of length 1..40 over shuffled ids
    val ids = rnd.shuffle((1L to 3000L).toVector).iterator
    val edges = (1 to 60).flatMap { _ =>
      val len = 1 + rnd.nextInt(40)
      val nodes = Seq.fill(len + 1)(ids.next())
      nodes.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
    }
    val chain = edges.toDF("src", "dst")
    val viaHeads = graft.operators.ChainLabel.heads(chain)
      .as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val viaCC = graft.operators.ConnectedComponents.run(chain)
      .as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(viaHeads == viaCC)
  }

  test("a cycle in the chain edges is rejected, not mislabeled") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    intercept[Exception] {
      graft.operators.ChainLabel.heads(chain.coalesce(1)).collect()
    }
  }
}
