package graft

import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("typed props parse equals the regexp extraction on real data") {
    val ev = Tables.events(spark, sfDir)
    val typed = graft.sources.Ingest.eventsTyped(ev)
      .select(col("event_id"), col("y"))
    val rx = ev.select(col("event_id"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("y"))
    assert(typed.exceptAll(rx).isEmpty && rx.exceptAll(typed).isEmpty)
  }

  test("eventsTyped parses the document once, with no regexp in the plan") {
    val df = graft.sources.Ingest.eventsTyped(Tables.events(spark, sfDir))
      .select(col("event_id"), col("y"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("from_json"), plan.take(800))
    assert(!plan.contains("regexp_extract"), plan.take(800))
  }

  test("lineageForest: heap children, roots, and leaf counts") {
    val ev = Seq.tabulate(6)(i => (7L, i.toLong)).toDF("user_id", "event_id")
    val (spots, edges) = graft.sources.Ingest.lineageForest(ev)
    assert(spots.count() == 6)
    val e = edges.as[(Long, Long)].collect().toSet
    val base = 7L * 1000000L
    assert(e == Set((base + 1, base + 2), (base + 1, base + 3),
      (base + 2, base + 4), (base + 2, base + 5), (base + 3, base + 6)))
  }
}

class LineRepetitionSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.TextFeatures

  test("planted duplicate lines and paragraphs are measured exactly") {
    // doc 1: 4 non-blank lines of 21 chars total, "aa bb" appears twice
    // (5 of 21 chars in copies); two paragraphs, distinct. doc 2: no
    // duplicates anywhere.
    val d1 = "aa bb\ncc dd\n\naa bb\nee fff"
    val d2 = "one two\nthree four\n\nfive six"
    val got = TextFeatures.lineRepetition(
        Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, Int, Double, Double, Int, Double, Double)]
      .collect().sortBy(_._1).toList
    assert(got == List(
      (1L, 4, 0.25, math.floor(5.0 / 21.0 * 1e6 + 0.5) / 1e6, 2, 0.0, 0.0),
      (2L, 3, 0.0, 0.0, 2, 0.0, 0.0)))
  }

  test("blank lines are ignored; fully blank text yields zero fractions") {
    val got = graft.text.TextFeatures.lineRepetition(
        Seq((1L, "x\n  \n\n\nx"), (2L, " \n ")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, Int, Double, Double, Int, Double, Double)]
      .collect().sortBy(_._1).toList
    assert(got.head._2 == 2 && got.head._3 == 0.5)
    assert(got(1) == (2L, 0, 0.0, 0.0, 0, 0.0, 0.0))
  }
}

/** RepetitionStats kernel: hand-computed cases + map-only plan pin. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.TextFeatures

  test("hand-computed repetition stats") {
    // doc 1: "a a a b a b" -> 6 tokens, 2 distinct, run of 3 a's,
    // 5 2-grams, "a b" twice -> top2gram 2
    // doc 2: all distinct, no repeated 2-gram
    // doc 3: single token -> excluded (no 2-grams)
    val got = TextFeatures.repetition(
        Seq((1L, "a a a b a b"), (2L, "x y z"), (3L, "solo"))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Double, Double)]
      .collect().sortBy(_._1).toList
    assert(got == List(
      (1L, 6L, 3L, 2L, math.floor(4.0 / 6.0 * 1e6 + 0.5) / 1e6,
        math.floor(2.0 / 5.0 * 1e6 + 0.5) / 1e6),
      (2L, 3L, 1L, 1L, 0.0, 0.5)))
  }

  test("split semantics match Spark split (leading whitespace token)") {
    // " a a" splits to ["", "a", "a"]: 3 tokens, 2 distinct, run 2
    val got = TextFeatures.repetition(
        Seq((1L, " a a")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(got._2 == 3L && got._3 == 2L)
  }

  test("plan is map-only: no Exchange, no explode") {
    val plan = TextFeatures.repetition(
        Seq((1L, "a b")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"token-grain shuffle resurfaced:\n$plan")
    assert(!plan.contains("Generate"), s"explode resurfaced:\n$plan")
  }
}
