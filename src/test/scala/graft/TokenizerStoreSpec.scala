package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, TokenizerStore, Unigram, WordPiece}

/** Tokenizer-artifact persistence: a loaded model encodes identically
  * to the trained one, for all three trio members, on a real corpus. */
class TokenizerStoreSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .limit(500)

  private def stats(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("BPE round-trips exactly") {
    val dir = "/tmp/graft_tok_bpe"
    val m = Bpe.train(docs, col("text"), numMerges = 50, maxWords = 2000)
    TokenizerStore.saveBpe(spark, m, dir)
    val l = TokenizerStore.loadBpe(spark, dir)
    assert(l.ranks == m.ranks && l.vocab == m.vocab)
    assert(stats(Bpe.encodeStats(docs, col("doc_id"), col("text"), l))
      == stats(Bpe.encodeStats(docs, col("doc_id"), col("text"), m)))
  }

  test("unigram round-trips exactly") {
    val dir = "/tmp/graft_tok_ulm"
    val m = Unigram.train(docs, col("text"), vocabSize = 300, maxWords = 2000)
    TokenizerStore.saveUnigram(spark, m, dir)
    val l = TokenizerStore.loadUnigram(spark, dir)
    assert(l.logProb == m.logProb && l.maxPieceLen == m.maxPieceLen)
    assert(stats(Unigram.encodeStats(docs, col("doc_id"), col("text"), l))
      == stats(Unigram.encodeStats(docs, col("doc_id"), col("text"), m)))
  }

  test("WordPiece round-trips exactly") {
    val dir = "/tmp/graft_tok_wp"
    val m = WordPiece.train(docs, col("text"), numMerges = 50, maxWords = 2000)
    TokenizerStore.saveWordPiece(spark, m, dir)
    val l = TokenizerStore.loadWordPiece(spark, dir)
    assert(l.vocab == m.vocab && l.maxPieceLen == m.maxPieceLen)
    assert(stats(WordPiece.encodeStats(docs, col("doc_id"), col("text"), l))
      == stats(WordPiece.encodeStats(docs, col("doc_id"), col("text"), m)))
  }

  test("the artifact is inspectable as a plain table") {
    val dir = "/tmp/graft_tok_bpe" // written above
    val merges = spark.read.parquet(s"$dir/merges")
    assert(merges.columns.toSeq == Seq("rank", "left", "right"))
    // merges are densely ranked from 0
    val ranks = merges.select("rank").collect().map(_.getInt(0)).sorted
    assert(ranks.headOption.contains(0) && ranks.toSeq == (0 until ranks.length))
  }
}
