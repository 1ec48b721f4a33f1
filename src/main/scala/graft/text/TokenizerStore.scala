package graft.text

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.functions.{BpeModel, UnigramModel, WordPieceModel}

/** Tokenizer-artifact persistence — the build-once/serve-forever
  * contract for the tokenizer trio (the [[graft.vector.IndexStore]]
  * rule applied to tokenizers): training scans the corpus, so a
  * production pipeline trains ONCE, persists the artifact, and every
  * downstream job — packing, padding reports, OOV monitors, the
  * streaming encode — loads it instead of retraining. Artifacts are
  * plain parquet tables (one row per merge / piece / vocab entry), so
  * they are inspectable with any engine and diffable across corpus
  * versions (which merges/pieces changed between releases is itself a
  * drift signal).
  *
  * Round-trip fidelity is exact BY SCHEMA: each store writes every
  * field the model's encode path reads (BPE: ranked merges + vocab;
  * unigram: pieces + log-probs + maxPieceLen; WordPiece: vocab), so a
  * loaded model encodes bit-identically to the trained one — the spec
  * pins this on real corpora. */
object TokenizerStore {

  // ---- BPE: (rank, left, right) merges + (symbol) vocab ----

  def saveBpe(spark: SparkSession, model: BpeModel, dir: String): Unit = {
    import spark.implicits._
    model.ranks.toSeq.map { case ((l, r), rank) => (rank, l, r) }
      .toDF("rank", "left", "right")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/merges")
    model.vocab.toSeq.toDF("symbol")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vocab")
  }

  def loadBpe(spark: SparkSession, dir: String): BpeModel = {
    import spark.implicits._
    val ranks = spark.read.parquet(s"$dir/merges")
      .select("rank", "left", "right").as[(Int, String, String)]
      .collect().map { case (rank, l, r) => (l, r) -> rank }.toMap
    val vocab = spark.read.parquet(s"$dir/vocab")
      .select("symbol").as[String].collect().toSet
    new BpeModel(ranks, vocab)
  }

  // ---- unigram: (piece, log_prob) + the lattice width ----

  def saveUnigram(spark: SparkSession, model: UnigramModel, dir: String): Unit = {
    import spark.implicits._
    model.logProb.toSeq.toDF("piece", "log_prob")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/pieces")
    Seq(model.maxPieceLen).toDF("max_piece_len")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
  }

  def loadUnigram(spark: SparkSession, dir: String): UnigramModel = {
    import spark.implicits._
    val lp = spark.read.parquet(s"$dir/pieces")
      .select("piece", "log_prob").as[(String, Double)].collect().toMap
    val maxLen = spark.read.parquet(s"$dir/meta")
      .select("max_piece_len").as[Int].collect()(0)
    new UnigramModel(lp, maxLen)
  }

  // ---- WordPiece: (piece) vocab ----

  def saveWordPiece(spark: SparkSession, model: WordPieceModel, dir: String): Unit = {
    import spark.implicits._
    model.vocab.toSeq.toDF("piece")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vocab")
  }

  def loadWordPiece(spark: SparkSession, dir: String): WordPieceModel = {
    import spark.implicits._
    val vocab = spark.read.parquet(s"$dir/vocab")
      .select("piece").as[String].collect().toSet
    val maxLen = if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max
    new WordPieceModel(vocab, maxLen)
  }
}
