package graft

import org.apache.spark.sql.functions._

import graft.dedup.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val evalText = "alpha bravo charlie delta echo foxtrot golf hotel india"

  // corpus doc 1 embeds the full eval doc verbatim; 2 and 3 share no 8-gram
  private def corpus = Seq(
    (1L, s"intro words $evalText closing words"),
    (2L, "zulu yankee xray whiskey victor uniform tango sierra romeo quebec"),
    (3L, "alpha bravo charlie delta echo foxtrot golf DIFFERENT india tail")
  ).toDF("doc_id", "text")

  private def eval = Seq((100L, evalText)).toDF("doc_id", "text")

  test("a verbatim-embedded eval doc is flagged with its full gram set") {
    val got = Decontaminate.overlapPairs(
        corpus, col("doc_id"), col("text"),
        eval, col("doc_id"), col("text"), n = 8)
      .as[(Long, Long, Long)].collect().toSet
    // eval text has 9 tokens -> 2 distinct 8-grams, both inside doc 1;
    // doc 3 breaks every 8-gram with its DIFFERENT token
    assert(got === Set((1L, 100L, 2L)))
  }

  test("minShared gates the pair out") {
    val got = Decontaminate.overlapPairs(
      corpus, col("doc_id"), col("text"),
      eval, col("doc_id"), col("text"), n = 8, minShared = 3L)
    assert(got.count() === 0L)
  }

  test("clean drops exactly the contaminated documents") {
    val kept = Decontaminate.clean(
        corpus, col("doc_id"), col("text"),
        eval, col("doc_id"), col("text"), n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
  }

  test("matches a brute-force shingle intersection on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corp = docs.filter(col("doc_id") % 11 =!= 0)
    val ev = docs.filter(col("doc_id") % 11 === 0)
    val got = Decontaminate.overlapPairs(
        corp, col("doc_id"), col("text"), ev, col("doc_id"), col("text"), n = 8)
      .as[(Long, Long, Long)].collect().toSet
    def shs(df: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
      df.select(col("doc_id"),
          graft.functions.WordShingles(col("text"), 8).as("g"))
        .as[(Long, Seq[String])].collect()
        .map { case (id, g) => id -> g.toSet }.toMap
    val want = (for {
      (cid, cg) <- shs(corp); (eid, eg) <- shs(ev)
      inter = (cg & eg).size if inter >= 1
    } yield (cid, eid, inter.toLong)).toSet
    assert(got === want && want.nonEmpty)
  }
}
