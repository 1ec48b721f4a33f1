package graft

import org.apache.spark.sql.functions._
import graft.dedup.IncrementalDedup

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpusBatch() = {
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon"),
      (3L, "alpha beta gamma"), // corpus-internal dup: canonical is 1
      (4L, "zeta eta theta")
    ).toDF("id", "text")
    val batch = Seq(
      (101L, "alpha beta gamma"), // dup of corpus 1 (not 3: min id wins)
      (102L, "totally new text"),
      (103L, "delta epsilon"),    // dup of corpus 2
      (104L, "another new doc"),
      (105L, "totally new text")  // batch-internal dup: still new vs corpus
    ).toDF("id", "text")
    (corpus, batch)
  }

  private def expected = Map(
    101L -> Some(1L), 102L -> None, 103L -> Some(2L),
    104L -> None, 105L -> None)

  test("batch rows resolve to corpus canonicals; unseen rows are new") {
    val (corpus, batch) = corpusBatch()
    val out = IncrementalDedup.dedupAgainst(
      corpus, col("id"), col("text"), batch, col("id"), col("text"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toSeq
    assert(out.size == 5)
    out.foreach { case (id, dupOf, isNew) =>
      assert(dupOf == expected(id), s"doc $id")
      assert(isNew == (if (dupOf.isEmpty) 1 else 0), s"doc $id is_new")
    }
  }

  test("exactness survives a pathologically under-sized filter (false positives verified away)") {
    val (corpus, batch) = corpusBatch()
    // 1-item filter sizing at fpp 0.5: nearly every probe collides →
    // almost all rows take the verify-join path. Result must be
    // IDENTICAL (false positives die in the join; false negatives are
    // impossible by Bloom's contract).
    val out = IncrementalDedup.dedupAgainst(
      corpus, col("id"), col("text"), batch, col("id"), col("text"),
      fpp = 0.5, filterItemsOverride = Some(1L))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == expected, "under-sized filter changed the result")
  }

  test("probe is a native might_contain literal, not a UDF, and negatives skip the join") {
    val (corpus, batch) = corpusBatch()
    val idx = IncrementalDedup.index(corpus, col("id"), col("text"))
    val bytes = IncrementalDedup.buildFilter(idx, idx.count(), 0.01)
    // range (not a local relation) so ConvertToLocalRelation cannot
    // constant-fold the probe out of the executed plan
    val probed = spark.range(0, 100).select(xxhash64(col("id")).as("h"))
      .withColumn("m", IncrementalDedup.mightContain(bytes, col("h")))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected native bloom probe:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF"))
    // no-false-negative contract: every corpus hash probes true
    val hits = idx.withColumn("m", IncrementalDedup.mightContain(bytes, col("h")))
      .filter(!col("m")).count()
    assert(hits == 0L, "bloom filter missed a corpus hash (false negative)")
  }

  test("well-sized filter keeps the verify-join input to dups + fpp sliver") {
    val (corpus, _) = corpusBatch()
    val big = spark.range(0, 2000)
      .select(col("id"), concat(lit("batch doc "), col("id")).as("text"))
    val idx = IncrementalDedup.index(corpus, col("id"), col("text"))
    val bytes = IncrementalDedup.buildFilter(idx, idx.count(), 0.01)
    val candidates = big.select(xxhash64(col("text")).as("h"))
      .filter(IncrementalDedup.mightContain(bytes, col("h"))).count()
    // 2000 certainly-new docs vs a 3-key filter at 1% fpp: expected
    // ~20 false positives; 200 is a 10x margin on the binomial tail
    assert(candidates <= 200, s"bloom gate leaked $candidates of 2000 rows into the join")
  }

  test("streaming batch side: the operator runs unchanged on an unbounded stream") {
    // the crawl arrives as a stream, the snapshot is static: the bloom
    // probe is a literal expression (stream-safe map-side filter) and
    // the verify join is a stream-static join — so the SAME operator
    // code serves both surfaces; results must equal the batch run
    implicit val sql = spark.sqlContext
    val (corpus, batch) = corpusBatch()
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = IncrementalDedup.dedupAgainst(
      corpus, col("id"), col("text"),
      stream.toDS().toDF("id", "text"), col("id"), col("text"))
    val q = out.writeStream.format("memory").queryName("incdedup_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    stream.addData(batch.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    val run = q.start()
    try assert(run.awaitTermination(60000)) finally run.stop()
    val got = spark.table("incdedup_stream").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == expected, "stream result diverged from batch")
  }

  test("sf0.001 documents: bloom-gated result equals the plain text join") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val fast = IncrementalDedup.dedupAgainst(
      corpus, col("doc_id"), col("text"), batch, col("doc_id"), col("text"))
    val idx = corpus.groupBy(col("text")).agg(min(col("doc_id")).as("dup_of"))
    val plain = batch.join(idx, Seq("text"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNull.cast("int").as("is_new"))
    assert(fast.exceptAll(plain).isEmpty && plain.exceptAll(fast).isEmpty,
      "bloom-gated dedup diverged from the plain text join")
    assert(fast.count() == batch.count())
  }
}
