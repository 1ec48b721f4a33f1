package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance fuzzy join (the PassJoin scheme, public
  * algorithm — Li et al., "PassJoin: a partition-based method for
  * similarity joins"): find all (a, b) pairs with
  * levenshtein(a, b) <= d WITHOUT a cartesian product, using the
  * pigeonhole the banding family uses everywhere in this engine: cut
  * the left string into d+1 segments — d edits cannot touch all of
  * them — so any within-distance pair shares at least one segment
  * EXACTLY, at a position shifted by at most d. Candidates are an
  * equi-join on (left-length, segment-idx, substring); recall is
  * total BY CONSTRUCTION, and the final levenshtein gate (built-in
  * codegen'd expression) removes false candidates — so the output
  * EQUALS the brute-force definition, which is exactly what the
  * DuckDB oracle computes.
  *
  * Scale shape: the left side explodes to d+1 segment rows, the right
  * side to at most (d+1)·(2d+1)² probe substrings (d=1: 2·9=18 — tiny
  * constants); the join shuffles short substring keys; no pair is
  * materialized outside its blocking group. The classic alternative —
  * length-banded nested loops — is quadratic per length band and dies
  * at corpus scale.
  */
object EditJoin {

  /** Segment bounds of a length-`l` string cut into `k` parts: first
    * (l mod k) parts get one extra char. Returns (start, len), 0-based. */
  private[graft] def segments(l: Int, k: Int): Seq[(Int, Int)] = {
    val base = l / k
    val rem = l % k
    var start = 0
    (0 until k).map { i =>
      val len = base + (if (i < rem) 1 else 0)
      val s = (start, len); start += len; s
    }
  }

  /** All pairs (a_id, b_id, dist) with levenshtein(aName, bName) <= d,
    * for left strings of length >= d+1 (shorter left strings cannot be
    * cut into d+1 non-empty segments — the declared scope floor; the
    * oracle carries the same predicate). Null names never match.
    * Segments/probes are explode over computed arrays — codegen-
    * friendly, no UDF, no Dataset deserialization. */
  def pairs(a: DataFrame, aId: Column, aName: Column,
            b: DataFrame, bId: Column, bName: Column, d: Int = 1): DataFrame = {
    require(d >= 1, s"d must be >= 1, got $d")
    val k = d + 1
    // left: one row per segment — (la, seg_idx, substring)
    // parallelism floor (r17): the segment/probe explodes below are
    // the expensive per-row work -- see Ingest.parallelismFloor
    val aExpl = graft.sources.Ingest.parallelismFloor(
        a.select(aId.as("a_id"), aName.as("an")))
      .filter(col("an").isNotNull && length(col("an")) >= k)
      .withColumn("_la", length(col("an")))
      .withColumn("_seg", explode(expr(
        s"""transform(sequence(0, $d), i -> named_struct(
           |  'i', i,
           |  'sub', substring(an,
           |     1 + (i * (length(an) div $k)) + least(i, length(an) % $k),
           |     (length(an) div $k) + IF(i < length(an) % $k, 1, 0))))""".stripMargin)))
      .select(col("a_id"), col("an"), col("_la").as("la"),
        col("_seg.i").as("i"), col("_seg.sub").as("sub"))
      .filter(length(col("sub")) > 0)

    // right: probe substrings against left lengths la in [lb-d, lb+d]
    val bProbe = graft.sources.Ingest.parallelismFloor(
        b.select(bId.as("b_id"), bName.as("bn")))
      .filter(col("bn").isNotNull && length(col("bn")) > 0)
      .withColumn("_lb", length(col("bn")))
      .withColumn("_p", explode(expr(
        s"""flatten(transform(sequence(greatest($k, length(bn) - $d), length(bn) + $d), la ->
           |  flatten(transform(sequence(0, $d), i ->
           |    transform(sequence(-$d, $d), sh -> named_struct(
           |      'la', la, 'i', i,
           |      'start', (i * (la div $k)) + least(i, la % $k) + sh,
           |      'len', (la div $k) + IF(i < la % $k, 1, 0)))))))""".stripMargin)))
      .filter(col("_p.start") >= 0 &&
        col("_p.start") + col("_p.len") <= col("_lb") && col("_p.len") > 0)
      .select(col("b_id"), col("bn"), col("_p.la").as("la"), col("_p.i").as("i"),
        expr("substring(bn, _p.start + 1, _p.len)").as("sub"))

    // gate BEFORE dedup with the BOUNDED levenshtein (threshold form:
    // O(d·n) banded computation with early exit, returns -1 above the
    // bound — ~n/d times cheaper than the full O(n²) distance, which
    // is the whole verify cost when a degenerate block inflates the
    // candidate set); a distinct before the gate would instead shuffle
    // every candidate's full name pair
    aExpl.join(bProbe, Seq("la", "i", "sub"))
      .withColumn("dist", levenshtein(col("an"), col("bn"), d))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist")).distinct()
  }
}
