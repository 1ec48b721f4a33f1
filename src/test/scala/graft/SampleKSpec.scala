package graft

import org.apache.spark.sql.functions._

import graft.text.SampleK

/** [[graft.text.SampleK]] — bucket-histogram exact-k selection vs the
  * naive full-sort window, over real docs and boundary shapes. */
class SampleKSpec extends SparkSpec {
  import spark.implicits._

  private def naive(docs: Seq[(Long, String)], k: Int): Set[(Long, String)] =
    docs.groupBy(_._2).flatMap { case (g, rows) =>
      rows.map { case (id, _) =>
        (id, g, (id % 2147483647L) * 48271L % 2147483647L) }
        .sortBy(r => (r._3, r._1)).take(k).map(r => (r._1, g))
    }.toSet

  test("matches the full-sort selection on real docs across k values") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toSeq
    for (k <- Seq(1, 3, 17, 1000)) {
      val got = SampleK.sampleExactK(docs.toDF("doc_id", "source"),
          col("doc_id"), col("source"), k)
        .as[(Long, String)].collect().toSet
      assert(got == naive(docs, k), s"k=$k")
    }
  }

  test("groups smaller than k return whole; exact size otherwise") {
    val docs = (1L to 100L).map(i => (i, if (i <= 5) "small" else "big"))
    val got = SampleK.sampleExactK(docs.toDF("doc_id", "grp"),
        col("doc_id"), col("grp"), 10)
      .as[(Long, String)].collect().toSeq
    assert(got.count(_._2 == "small") == 5)
    assert(got.count(_._2 == "big") == 10)
    assert(got.toSet == naive(docs, 10))
  }

  test("deterministic across runs and partitionings") {
    val docs = (1L to 500L).map(i => (i, s"g${i % 3}"))
    def run(parts: Int) =
      SampleK.sampleExactK(docs.toDF("doc_id", "grp").repartition(parts),
          col("doc_id"), col("grp"), 7)
        .as[(Long, String)].collect().toSet
    assert(run(1) == run(13) && run(13) == naive(docs, 7))
  }
}
