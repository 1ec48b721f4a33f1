package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{NfcClean, NormalizeText}

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    NormalizeText.clean(UTF8String.fromString(s)).toString

  private val composed = "caf" + "\u00e9"   // precomposed e-acute
  private val decomposed = "cafe" + "\u0301" // e + COMBINING ACUTE

  test("NFC composes decomposed sequences") {
    assert(clean(decomposed) == composed)
    // already-composed input is untouched
    assert(clean(composed) == composed)
  }

  test("control characters are stripped; newline and tab survive the strip") {
    assert(clean("a\u0001b\u0007c\u007fd") == "abcd")
    assert(clean("a\nb") == "a\nb")
    // tab survives the ctl strip but collapses as horizontal whitespace
    assert(clean("a\tb") == "a b")
  }

  test("horizontal whitespace collapses and ends trim") {
    assert(clean("  a   b \t c  ") == "a b c")
    // newlines are not horizontal whitespace: never collapsed/trimmed
    assert(clean("a \n b") == "a \n b")
    assert(clean("\n a") == "\n a")
  }

  test("ASCII prose is a fixed point") {
    val s = "the quick brown fox"
    assert(clean(s) == s)
  }

  test("the expression matches the kernel") {
    val rows = Seq(decomposed + " x", "a\u0002b", "  s  p  ", "plain")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = rows.toDF("id", "t")
      .select(col("id"), NfcClean(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (i, t) => assert(got(i) == clean(t)) }
  }

  test("q_norm runs end-to-end and every row changed") {
    val out = SparkEntry.queries("q_norm")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // the constructed tail always carries a double space: changed = 1
    assert(out.forall(_.getInt(2) == 1))
    // no output row retains a stripped control char or a double space
    out.foreach { r =>
      val t = r.getString(1)
      assert(!t.exists(c => (c < 0x20 && c != '\n' && c != '\t') || c == 0x7f), t)
      assert(!t.contains("  "), t)
    }
  }
}
