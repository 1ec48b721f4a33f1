package graft

import graft.sources.TextCorpusIngest
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class TextCorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def write(lines: Seq[String], suffix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ing")
    java.nio.file.Files.write(dir.resolve(s"part-0$suffix"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("jsonl: clean rows parse typed, corrupt lines quarantine with the raw text") {
    val path = write(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "zweite zeile", "lang": "de"}""",
      """{"doc_id": 3, "text": "truncated...""",   // broken JSON
      """not json at all"""), ".jsonl")
    val (clean, quarantine) = TextCorpusIngest.jsonl(spark, path, docSchema)
    assert(clean.columns.toSeq == Seq("doc_id", "text", "lang"),
      "clean side carries exactly the declared schema")
    val rows = clean.as[(Long, String, String)].collect().toSet
    assert(rows === Set((1L, "hello world", "en"), (2L, "zweite zeile", "de")))
    val bad = quarantine.as[String].collect().toSet
    assert(bad === Set("""{"doc_id": 3, "text": "truncated...""",
      "not json at all"),
      "malformed lines are captured verbatim, not dropped")
  }

  test("csv: a row with the wrong arity quarantines, not corrupts neighbours") {
    val path = write(Seq(
      "doc_id,text,lang",
      "1,first doc,en",
      "2,broken row with,too,many,columns",
      "3,third doc,fr"), ".csv")
    val (clean, quarantine) = TextCorpusIngest.csv(spark, path, docSchema)
    assert(clean.as[(Long, String, String)].collect().toSet ===
      Set((1L, "first doc", "en"), (3L, "third doc", "fr")))
    assert(quarantine.as[String].collect().toSet ===
      Set("2,broken row with,too,many,columns"))
  }

  test("clean half feeds the corpus operators unchanged") {
    val path = write(Seq(
      """{"doc_id": 10, "text": "the cat sat on the mat and watched birds", "lang": "en"}""",
      """{"doc_id": 11, "text": "short", "lang": "en"}"""), ".jsonl")
    val (clean, _) = TextCorpusIngest.jsonl(spark, path, docSchema)
    val kept = clean
      .filter(graft.text.TextFeatures.qualityKeep(org.apache.spark.sql.functions.col("text")))
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(10L))
  }
}
