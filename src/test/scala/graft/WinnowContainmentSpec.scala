package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Containment via winnowing fingerprints: a document embedding a long
  * verbatim span of another must pair with it at high containment even
  * though whole-document Jaccard is low; unrelated documents must not
  * pair. Expectation computed brute-force from the Winnow expression's
  * own fingerprint sets (the expression itself is DuckDB-oracled by
  * q_winnow). */
class WinnowContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("planted contained span is found; unrelated docs are not paired") {
    val span = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 4
    val docs = Seq(
      (1L, span + " kilo lima mike november"),
      (2L, "totally different words here papa quebec romeo sierra tango " * 6 + span),
      (3L, "unrelated content zulu yankee xray whiskey victor uniform " * 8),
      (4L, "more disjoint vocabulary one two three four five six seven " * 8)
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowContainment(docs, col("doc_id"), col("text"),
        k = 8, w = 4, minShared = 5L, maxDf = 10L)
      .as[(Long, Long, Long, Double)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._4).toMap
    assert(byPair.contains((1L, 2L)), s"contained span not detected: ${pairs.toSeq}")
    assert(byPair((1L, 2L)) > 0.5, s"containment too low: ${byPair((1L, 2L))}")
    assert(!byPair.contains((3L, 4L)), "unrelated docs paired")
    // brute-force cross-check of the shared count for the planted pair
    val fps = docs.select(col("doc_id"),
        explode(graft.functions.Winnow(col("text"), 8, 4)).as("fp"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expectedShared = (fps(1L) & fps(2L)).size
    val gotShared = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
    // winnowContainment counts only df-capped fingerprints; with 4 docs
    // and maxDf=10 nothing is pruned, so counts must match exactly
    assert(gotShared == expectedShared, s"shared $gotShared != brute $expectedShared")
  }
}
