package graft

import org.apache.spark.sql.functions._

import graft.text.SpanDedup

/** [[graft.text.SpanDedup]] — ExactSubstr-style repeated-span removal:
  * planted cross-doc spans, within-doc repeats, overlap/adjacency
  * island merging, canonical first-occurrence keep, sub-gate docs. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int) =
    SpanDedup.dedupSpans(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), n)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("planted cross-doc span removed from the later doc only") {
    val span = "w1 w2 w3 w4"
    val r = run(Seq(
      (1L, s"alpha $span beta"),
      (2L, s"gamma delta $span epsilon zeta")), n = 4)
    assert(r(1L) == ((6L, 0L, 0L, s"alpha $span beta")))
    assert(r(2L) == ((8L, 4L, 1L, "gamma delta epsilon zeta")))
  }

  test("longer shared span: overlapping n-grams merge into ONE island") {
    val span = "a b c d e f"           // 6 tokens, n=4 -> 3 dup grams
    val r = run(Seq(
      (1L, s"$span x"), (2L, s"y $span")), n = 4)
    assert(r(1L)._2 == 0L)
    assert(r(2L) == ((7L, 6L, 1L, "y")))
  }

  test("two separated shared spans count as two islands") {
    val r = run(Seq(
      (1L, "p q r s MID1 MID2 t u v w"),
      (2L, "p q r s far far2 far3 t u v w")), n = 4)
    assert(r(1L)._2 == 0L)
    assert(r(2L) == ((11L, 8L, 2L, "far far2 far3")))
  }

  test("within-doc repeat: first occurrence kept, second removed") {
    val r = run(Seq((1L, "a b c a b c")), n = 3)
    // grams: (0,'a b c'),(1,'b c a'),(2,'c a b'),(3,'a b c') — only
    // 'a b c' duplicates; start 3 removes [3,5]
    assert(r(1L) == ((6L, 3L, 1L, "a b c")))
  }

  test("docs below the token gate pass through rebuilt") {
    val r = run(Seq((1L, "a b"), (2L, "a b")), n = 3)
    assert(r(1L) == ((2L, 0L, 0L, "a b")))
    assert(r(2L) == ((2L, 0L, 0L, "a b")))
  }

  test("canonical election is (doc_id, pos)-lexicographic") {
    // same span at pos 5 of doc 1 and pos 0 of doc 2: doc 1 wins
    val r = run(Seq(
      (1L, "f1 f2 f3 f4 f5 s1 s2 s3"),
      (2L, "s1 s2 s3 o1 o2 o3 o4 o5")), n = 3)
    assert(r(1L)._2 == 0L)
    assert(r(2L) == ((8L, 3L, 1L, "o1 o2 o3 o4 o5")))
  }

  test("entire doc removable: empty rebuilt text") {
    val r = run(Seq((1L, "a b c d"), (2L, "a b c d")), n = 4)
    assert(r(2L) == ((4L, 4L, 1L, "")))
  }
}
