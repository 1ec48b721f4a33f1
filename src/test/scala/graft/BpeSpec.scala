package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** [[graft.text.Bpe]] — hand-derived merge sequence and encodes on a
  * tiny corpus, zero-merge baseline, unk accounting, and the oracled
  * OOV-rate sibling. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-derived merges: tie-break and exhaustion") {
    // corpus "aa aa ab": pairs (a,a):2 and (a,</w>):2 tie; "</w>"<"a"
    // lexicographically, so (a,</w>) merges first, then (a,a</w>);
    // remaining pairs are singletons -> exhausted at 2 merges.
    val m = Bpe.trainFromHistogram(Array(("aa", 2L), ("ab", 1L)), numMerges = 10)
    assert(m.ranks == Map(("a", "</w>") -> 0, ("a", "a</w>") -> 1))
    assert(m.vocab == Set("a", "b", "</w>", "a</w>", "aa</w>"))
    assert(m.encode("aa").toSeq == Seq("aa</w>"))
    assert(m.encode("ab").toSeq == Seq("a", "b", "</w>"))
    assert(m.encode("ax").toSeq == Seq("a", "x", "</w>"))
  }

  test("encodeStats: counts, zero-merge baseline, unk on unseen chars") {
    val docs = Seq((1L, "aa aa ab"), (2L, "aa ax qq")).toDF("doc_id", "text")
    val m = Bpe.train(docs.filter(col("doc_id") === 1L), col("text"),
      numMerges = 10)
    val got = Bpe.encodeStats(docs, col("doc_id"), col("text"), m)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // model = the hand-derived one above; doc 1: aa -> 1 subword (x2),
    // ab -> 3; doc 2: aa -> 1, ax -> 3 (x unk), qq -> 3 (both q unk)
    assert(got(1L) == ((3L, 5L, 0L)))
    assert(got(2L) == ((3L, 7L, 3L)))
    val m0 = Bpe.train(docs, col("text"), numMerges = 0)
    val base = Bpe.encodeStats(docs, col("doc_id"), col("text"), m0)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // 0 merges: every word is codepoints + </w>
    assert(base(1L) == (2 + 1) * 3)
    assert(base(2L) == (2 + 1) * 3)
  }

  test("more merges never increase the subword count; training corpus has no unk") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(40)
    val counts = Seq(0, 20, 100).map { n =>
      val m = Bpe.train(docs, col("text"), numMerges = n)
      val r = Bpe.encodeStats(docs, col("doc_id"), col("text"), m)
        .agg(sum("n_subwords"), sum("n_unk")).as[(Long, Long)].head()
      assert(r._2 == 0L, s"unk at $n merges")
      r._1
    }
    assert(counts == counts.sorted.reverse)
    assert(counts.last < counts.head)
  }

  test("oovRate matches a local replica") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val local = docs.as[(Long, String)].collect().toSeq
    val words = local.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
    val vocab = words.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(100).map(_._1).toSet
    val expect = local.map { case (id, t) =>
      val tk = t.split("\\s+").filter(_.nonEmpty)
      val oov = tk.count(!vocab.contains(_))
      (id, (tk.length.toLong, oov.toLong,
        math.floor(oov.toDouble / tk.length * 1e6 + 0.5) / 1e6))
    }.toMap
    val got = Bpe.oovRate(docs, col("doc_id"), col("text"), 100)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expect)
  }
}
