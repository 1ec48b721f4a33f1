package graft

import org.apache.spark.sql.functions._

import graft.dedup.{IncrementalMinHash, MinHashLSH}

/** Incremental near-dup dedup against a persisted signature index:
  * probe parity with the batch banding generator, estimator parity,
  * index round-trip, deterministic dup_of selection. */
class IncrementalMinHashSpec extends SparkSpec {
  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog again and again"
  private val near2 = "the quick brown fox jumps over the lazy dog again and again today"
  private val far = "completely different content about distributed query engines at scale"
  private val far2 = "unrelated sentences describing laboratory imaging pipelines and tracking"

  private def corpus = Seq((10L, near1), (11L, near2), (12L, far))
    .toDF("doc_id", "text")
  private def batch = Seq((20L, near1), (21L, far2)).toDF("doc_id", "text")

  test("probe finds exactly the cross batch-corpus banding candidates") {
    val idx = IncrementalMinHash.buildIndex(corpus, col("doc_id"), col("text"))
    val got = IncrementalMinHash.probe(idx, batch, col("doc_id"), col("text"))
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    // ground truth: the batch banding generator over corpus+batch,
    // restricted to cross pairs
    val all = corpus.union(batch)
    val allPairs: Set[(Long, Long)] = MinHashLSH.candidatePairs(
        MinHashLSH.signatures(all, col("doc_id"), col("text"), 3, 64),
        bands = 16, rowsPerBand = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val cross = allPairs
      .filter { case (a, b) => (a >= 20L) != (b >= 20L) }
      .map { case (a, b) => if (a >= 20L) (a, b) else (b, a) }
    assert(got == cross)
    assert(got.contains((20L, 10L))) // the identical pair
  }

  test("the estimate matches the signature estimator; identical = 1.0") {
    val idx = IncrementalMinHash.buildIndex(corpus, col("doc_id"), col("text"))
    val got = IncrementalMinHash.probe(idx, batch, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((20L, 10L)) == 1.0)
    val sigs = MinHashLSH.signatures(corpus.union(batch),
        col("doc_id"), col("text"), 3, 64)
      .as[(Long, Array[Long])].collect().toMap
    got.foreach { case ((b, c), e) =>
      assert(e == graft.functions.Numeric.croundD(
        graft.streaming.MinHashStream.estJaccard(sigs(b), sigs(c), 64), 6))
    }
  }

  test("a persisted index probes identically to a fresh one, with its own parameters") {
    val dir = "/tmp/graft_minhash_index"
    // build at NON-default parameters: probeStored must recover them
    val idx = IncrementalMinHash.buildIndex(corpus, col("doc_id"), col("text"),
      shingleK = 2, k = 32, bands = 8)
    IncrementalMinHash.saveIndex(idx, dir, shingleK = 2, k = 32, bands = 8)
    val (loaded, sk, k, b) = IncrementalMinHash.loadIndex(spark, dir)
    assert((sk, k, b) == ((2, 32, 8)))
    val fresh = IncrementalMinHash.probe(idx, batch, col("doc_id"), col("text"),
        shingleK = 2, k = 32, bands = 8)
      .orderBy("batch_id", "corpus_id").collect().toSeq
    val stored = IncrementalMinHash.probeStored(spark, dir, batch,
        col("doc_id"), col("text"))
      .orderBy("batch_id", "corpus_id").collect().toSeq
    assert(stored == fresh)
    assert(fresh.nonEmpty) // the identical pair survives at these params
    // the serving layout is band-partitioned on disk
    assert(new java.io.File(s"$dir/index").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("band=")))
    // a MISMATCHED manual probe fails fast ON EXECUTION (a k mismatch
    // makes bucket keys incomparable: the join would quietly return
    // nothing and every batch row would pass as new); the guard is
    // lazy, riding the probe action — so the error surfaces when the
    // plan runs, even though the bucket join itself matches nothing
    val ex = intercept[Throwable] {
      IncrementalMinHash.probe(loaded, batch, col("doc_id"), col("text"),
        shingleK = 3, k = 64, bands = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("signature width")), ex.toString)
  }

  test("dedupAgainst flags known near-dups and passes novel docs") {
    val idx = IncrementalMinHash.buildIndex(corpus, col("doc_id"), col("text"))
    val got = IncrementalMinHash.dedupAgainst(idx, batch, col("doc_id"),
        col("text"), threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getInt(2))).toMap
    assert(got(20L)._1.contains(10L) && got(20L)._2 == 0)
    assert(got(21L) == ((None, 1)))
  }

  test("dup_of tie-breaks to the smallest corpus id at equal estimate") {
    val twoSame = Seq((30L, near1), (31L, near1)).toDF("doc_id", "text")
    val idx = IncrementalMinHash.buildIndex(twoSame, col("doc_id"), col("text"))
    val got = IncrementalMinHash.dedupAgainst(idx,
        Seq((40L, near1)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(40L) == 30L)
  }
}
