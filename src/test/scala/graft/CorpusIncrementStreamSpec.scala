package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.CorpusIncrementStream
import graft.text.{CorpusBuild, CorpusIncrement}

/** Streaming corpus maintenance: micro-batches fold into the 31g3
  * artifact store, the maintained sample equals the batch rebuild over
  * everything ingested, and a replayed COMPLETED batch is skipped by
  * the ledger instead of double-appended. */
class CorpusIncrementStreamSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("doc_id", "text", "lang", "source")

  test("maintained artifacts equal the full rebuild; completed-batch replay is a no-op") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("icorpus_stream").toString
    val eval = Seq((1L, "quick brown fox jumps over the lazy sleeping dog tonight",
      "en", "ev")).toDF(cols: _*)
    val base = Seq(
      (100L, "the alpha beta gamma delta", "en", "s1"),
      (101L, "the alpha beta gamma epsilon", "en", "s1"),
      (102L, "the kappa lambda mu nu xi", "en", "s1"))
    val b1 = Seq(
      (1001L, "the kappa lambda mu nu xi", "en", "s1"), // exact dup
      (1002L, "the rho sigma tau upsilon phi", "en", "s1"))
    val b2 = Seq(
      (2000L, "the rho sigma tau upsilon chi", "en", "s1"), // near-dups 1002
      (2001L, "alpha quick brown fox jumps over the lazy sleeping dog omega",
        "en", "s1")) // decon casualty
    CorpusIncrement.build(base.toDF(cols: _*), eval, dir, shingleK = 3,
      threshold = 0.4, maxDf = 3L, deconN = 8, nBuckets = 8)

    val stream = MemoryStream[(Long, String, String, String)]
    val q = CorpusIncrementStream.maintain(
      stream.toDF().toDF(cols: _*), dir, s"$dir/_ckpt")
    try Seq(b1, b2).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    } finally q.stop()

    def out() = CorpusIncrement.assemble(spark, dir)
      .as[(Long, String, String)].collect().toSet
    val want = CorpusBuild.run((base ++ b1 ++ b2).toDF(cols: _*), eval,
        shingleK = 3, threshold = 0.4, maxDf = 3L, deconN = 8)
      .as[(Long, String, String)].collect().toSet
    val got = out()
    assert(got == want)
    assert(!got.map(_._1)(1001L) && !got.map(_._1)(2001L)
      && got.map(_._1)(1002L))

    // a replayed COMPLETED batch is skipped by the ledger — the store
    // (including the additive df parts a blind re-append would
    // corrupt) is byte-for-byte untouched
    def dfRows() = spark.read.parquet(s"$dir/df")
      .select("shingle", "df").as[(String, Long)].collect()
      .groupBy(identity).map { case (k, v) => (k, v.length) }.toSet
    val before = (out(), dfRows())
    CorpusIncrementStream.maintainBatch(dir)(b2.toDF(cols: _*), 1L)
    assert((out(), dfRows()) == before)
    // an UNSEEN batch id still applies (the ledger gates on id)
    val b3 = Seq((3000L, "the brand new words arrive here", "en", "s1"))
    CorpusIncrementStream.maintainBatch(dir)(b3.toDF(cols: _*), 7L)
    assert(out() == CorpusBuild.run((base ++ b1 ++ b2 ++ b3).toDF(cols: _*),
        eval, shingleK = 3, threshold = 0.4, maxDf = 3L, deconN = 8)
      .as[(Long, String, String)].collect().toSet)
  }

  /** (relative path, size) of every data file under `dir`, ledger and
    * stream checkpoint excluded. */
  private def fileCensus(dir: String): Set[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => (root.relativize(p).toString, java.nio.file.Files.size(p)))
      .filterNot(p => p._1.startsWith("_ledger") || p._1.startsWith("_ckpt"))
      .toSet
  }

  test("crash injection: a kill mid-increment (across the eight artifact " +
      "dirs) rolls back byte-exactly; the replayed batch then lands") {
    val dir = java.nio.file.Files.createTempDirectory("icorpus_crash").toString
    val eval = Seq((1L, "quick brown fox jumps over the lazy sleeping dog tonight",
      "en", "ev")).toDF(cols: _*)
    val base = Seq(
      (100L, "the alpha beta gamma delta", "en", "s1"),
      (101L, "the alpha beta gamma epsilon", "en", "s1"),
      (102L, "the kappa lambda mu nu xi", "en", "s1"))
    val b1 = Seq(
      (1001L, "the kappa lambda mu nu xi", "en", "s1"),
      (1002L, "the rho sigma tau upsilon phi", "en", "s1"))
    CorpusIncrement.build(base.toDF(cols: _*), eval, dir, shingleK = 3,
      threshold = 0.4, maxDf = 3L, deconN = 8, nBuckets = 8)
    def out() = CorpusIncrement.assemble(spark, dir)
      .as[(Long, String, String)].collect().toSet
    val want0 = out()
    val committedCensus = fileCensus(dir)

    // the widest torn span: the increment ran to completion across all
    // eight artifact dirs (hidx/post/postd/df/exdocs/meta appends +
    // the new pairs/labels version dirs) and died before the marker
    val boom = intercept[RuntimeException] {
      graft.sources.CommitLog.atomically(spark, dir, 0L) {
        CorpusIncrement.increment(b1.toDF(cols: _*), dir)
        throw new RuntimeException("simulated crash")
      }
    }
    assert(boom.getMessage == "simulated crash")
    assert(fileCensus(dir) != committedCensus, "the store must be torn")
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == committedCensus,
      "rollback must restore the committed file set byte-for-byte")
    assert(out() == want0)

    // the stream replays batch 0 (checkpoint never committed): it now
    // applies cleanly and serving equals the full rebuild
    CorpusIncrementStream.maintainBatch(dir)(b1.toDF(cols: _*), 0L)
    assert(out() == CorpusBuild.run((base ++ b1).toDF(cols: _*), eval,
        shingleK = 3, threshold = 0.4, maxDf = 3L, deconN = 8)
      .as[(Long, String, String)].collect().toSet)

    // a torn DIRECT-API store (pair/label versions out of lockstep —
    // the kill-between-version-dirs case) fails fast at read time and
    // is repaired by recover
    val committed2 = fileCensus(dir)
    intercept[RuntimeException] {
      graft.sources.CommitLog.atomically(spark, dir, 1L) {
        val src = java.nio.file.Paths.get(dir, "pairs", "v=1")
        val dst = java.nio.file.Paths.get(dir, "pairs", "v=9")
        java.nio.file.Files.createDirectories(dst)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(src).iterator().asScala.foreach(f =>
          java.nio.file.Files.copy(f, dst.resolve(f.getFileName.toString)))
        throw new RuntimeException("simulated crash")
      }
    }
    val torn = intercept[IllegalArgumentException] { out() }
    assert(torn.getMessage.contains("torn pair/label versions"))
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == committed2)
    assert(out() == CorpusBuild.run((base ++ b1).toDF(cols: _*), eval,
        shingleK = 3, threshold = 0.4, maxDf = 3L, deconN = 8)
      .as[(Long, String, String)].collect().toSet)
  }
}
