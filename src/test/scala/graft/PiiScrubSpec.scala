package graft

import org.apache.spark.sql.functions._
import graft.text.TextFeatures

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    TextFeatures.piiScrub(texts.toDF("id", "text"), col("id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap

  test("detects phones, IPv4s and card-shaped digit runs; counts each class independently") {
    val out = run(
      (1L, "call +44-123-4567 or +1-800-9999 now"),
      (2L, "server at 192.168.0.1 and 10.0.0.255"),
      (3L, "card 4111111111111111 acct 123456789012"),
      (4L, "clean text with 123 and 1.2 nothing else"))
    assert(out(1L)._1 == 2 && out(1L)._2 == 0 && out(1L)._3 == 0)
    assert(out(2L)._1 == 0 && out(2L)._2 == 2 && out(2L)._3 == 0)
    assert(out(3L)._1 == 0 && out(3L)._2 == 0 && out(3L)._3 == 2)
    assert(out(4L) == ((0, 0, 0, 40)))
  }

  test("thresholds: 11-digit run is not an id number; 20 digits is one greedy match") {
    val out = run(
      (1L, "12345678901"),       // 11 digits: below the 12-digit floor
      (2L, "12345678901234567890")) // 20 digits: one greedy 19-digit match + 1 left over
    assert(out(1L)._3 == 0)
    assert(out(2L)._3 == 1)
  }

  test("redaction replaces matches and removes their digits from later classes") {
    val out = run((1L, "+12-345-6789"))
    // phone redacts first: "<PHONE>" (7 chars), no residual digits for
    // ip/id to re-match
    assert(out(1L) == ((1, 0, 0, 7)))
    val ip = run((10L, "99.99.99.99"))
    // an IPv4's octets can never form a 12-digit run (dots break runs)
    assert(ip(10L) == ((0, 1, 0, 4)))
  }

  test("counts run on sequentially-redacted text: an id-run overlapping a phone is not double-reported") {
    // raw text holds a 15-digit run, but the phone redaction consumes
    // its first 4 digits leaving 11 (below the id floor): the count
    // must agree with the redaction output (no <ID> placeholder)
    val out = run((1L, "+1-234-567890123456789"))
    assert(out(1L)._1 == 1 && out(1L)._3 == 0,
      s"counted an id-run the redaction never scrubbed: ${out(1L)}")
    // "<PHONE>" + 11 digits = 18 chars
    assert(out(1L)._4 == 18)
  }

  test("scrubbed_len arithmetic: placeholders substitute in place") {
    val out = run((1L, "x 1.2.3.4 y"))
    // "x <IP> y" = 8 chars
    assert(out(1L)._4 == 8)
  }

  test("q_pii construction yields non-trivial per-class counts on real events") {
    val out = SparkEntry.queries("q_pii")(spark, sfDir)
    val agg = out.agg(sum("n_phones"), sum("n_ips"), sum("n_idnums")).head()
    assert(agg.getLong(0) > 0, "no phones planted")
    assert(agg.getLong(1) > 0, "no ips planted")
    assert(agg.getLong(2) > 0, "no id numbers planted")
  }
}
