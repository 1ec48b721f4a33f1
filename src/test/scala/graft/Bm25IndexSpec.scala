package graft

import org.apache.spark.sql.functions._

import graft.text.{Bm25, Bm25Index}

/** Incremental BM25 index: serving from build ∪ append is
  * bit-identical to the direct query over the concatenated corpus. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private val queries = Seq(1 -> "hash join", 2 -> "window agg",
    3 -> "customer table scan")

  test("index serving equals the direct query; appends fold in exactly") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    Bm25Index.build(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      col("doc_id"), col("text"), dir)
    Bm25Index.append(docs.filter(pmod(col("doc_id"), lit(5)) === 0),
      col("doc_id"), col("text"), dir)
    val got = Bm25Index.topK(spark, dir, queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    val want = Bm25.topK(docs, col("doc_id"), col("text"), queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
    // a second append folds in the same way: rebuild expectations
    // over the extended corpus
    val extra = Seq((900001L, "hash join hash join window"),
      (900002L, "customer scan")).toDF("doc_id", "text")
    Bm25Index.append(extra, col("doc_id"), col("text"), dir)
    val got2 = Bm25Index.topK(spark, dir, queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    val want2 = Bm25.topK(docs.select("doc_id", "text").unionByName(extra),
        col("doc_id"), col("text"), queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    assert(got2 == want2)
    // the planted exact-phrase doc must surface for query 1
    assert(got2.exists { case (q, d, _, _, _) => q == 1 && d == 900001L })
    assert(got2 != got) // the append genuinely changed rankings
  }

  test("compaction folds fragmented buckets to one file; serving is bit-identical") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("bm25_compact").toString
    Bm25Index.build(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      col("doc_id"), col("text"), dir, nBuckets = 8)
    Bm25Index.append(docs.filter(pmod(col("doc_id"), lit(10)) === 0),
      col("doc_id"), col("text"), dir)
    Bm25Index.append(docs.filter(pmod(col("doc_id"), lit(10)) === 5),
      col("doc_id"), col("text"), dir)
    val BucketRe = "/bucket=(\\d+)/".r
    def linesPerBucket(): Map[Int, Int] =
      graft.sources.SnapshotStore.currentFiles(spark, dir)
        .flatMap(l => BucketRe.findFirstMatchIn(l).map(_.group(1).toInt))
        .groupBy(identity).map { case (b, ls) => b -> ls.length }
    def metaLines(): Int =
      graft.sources.SnapshotStore.currentFiles(spark, dir)
        .count(_.startsWith("parts/m_"))
    assert(linesPerBucket().values.exists(_ >= 2),
      "appends should fragment buckets")
    val before = Bm25Index.topK(spark, dir, queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    Bm25Index.compact(spark, dir)
    // every bucket is exactly one manifest line; meta folded to one
    assert(linesPerBucket().values.forall(_ == 1), s"got ${linesPerBucket()}")
    assert(metaLines() == 1)
    val after = Bm25Index.topK(spark, dir, queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    assert(after == before)
    assert(after.nonEmpty)
    // idempotent: a second compaction is a no-op (generation unmoved)
    val gen = graft.sources.SnapshotStore.currentGen(spark, dir)
    Bm25Index.compact(spark, dir)
    assert(graft.sources.SnapshotStore.currentGen(spark, dir) == gen)
    assert(Bm25Index.topK(spark, dir, queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet == before)
  }

  test("serving reads only the query terms' buckets") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val dir = java.nio.file.Files.createTempDirectory("bm25_prune").toString
    Bm25Index.build(docs, col("doc_id"), col("text"), dir, nBuckets = 16)
    // the static prune is manifest-LINE selection: the postings scan's
    // file set IS the one bucket of a one-term query — untouched
    // buckets are never even listed (sparkPlan, not executedPlan — AQE
    // wraps the latter before execution and hides the scan node)
    val scanFiles = Bm25Index.topK(spark, dir, Seq(1 -> "hash"))
      .queryExecution.sparkPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("parts/p")) =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).length
      }
    assert(scanFiles.nonEmpty && scanFiles.head == 1,
      s"postings files read: $scanFiles")
  }
}
