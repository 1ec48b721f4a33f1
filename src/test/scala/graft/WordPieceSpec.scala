package graft

import org.apache.spark.sql.functions._

import graft.functions.WordPieceModel
import graft.text.WordPiece

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // ---- greedy longest-match encode against hand-built vocabularies ----

  test("greedy longest-match segments exactly") {
    val m = new WordPieceModel(
      Set("a", "ab", "abc", "##b", "##c", "##d", "##cd"), 8)
    assert(m.encode("abc").toSeq == Seq("abc"))
    assert(m.encode("abcd").toSeq == Seq("abc", "##d"))
    assert(m.encode("abd").toSeq == Seq("ab", "##d"))
    // continuations prefer the longest too: "a" + "##cd" beats ##c,##d
    assert(m.encode("acd").toSeq == Seq("a", "##cd"))
  }

  test("an uncoverable word is one [UNK], not a char fallback") {
    val m = new WordPieceModel(Set("a", "##b"), 8)
    assert(m.encode("axb") == null) // 'x' has no piece
    val r = m.stats(org.apache.spark.unsafe.types.UTF8String.fromString("ab axb"))
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 3L, 1L)))
  }

  test("greedy commits without backtracking (the documented BERT walk)") {
    // "ab" wins position 0, then "##c" is missing: dead end -> [UNK],
    // even though a + ##bc covers the word
    val m = new WordPieceModel(Set("a", "ab", "##b", "##bc"), 8)
    assert(m.encode("abc") == null)
  }

  // ---- training ----

  test("likelihood ratio merges rarer-but-exclusive pairs first") {
    // pair (a,##b) count 10 but 'a' also appears alone 100x:
    // score 10/(110*10) = 1/110. pair (c,##d) count 3 with exclusive
    // symbols: score 3/(3*3) = 1/3. BPE-by-count would merge ab first;
    // WordPiece must merge cd
    val hist = Array(("ab", 10L), ("a", 100L), ("cd", 3L))
    val m = WordPiece.trainFromHistogram(hist, numMerges = 1)
    assert(m.vocab.contains("cd"))
    assert(!m.vocab.contains("ab"))
  }

  test("continuation merges produce ##-prefixed pieces") {
    val hist = Array(("xyz", 5L))
    val m = WordPiece.trainFromHistogram(hist, numMerges = 2)
    // only adjacent pairs exist inside one word: (x,##y),(##y,##z);
    // two merges must yield the whole word as a piece
    assert(m.vocab.contains("xyz"))
    assert(m.encode("xyz").toSeq == Seq("xyz"))
  }

  test("training is deterministic") {
    val hist = Array(("ingest", 4L), ("testing", 3L), ("resting", 2L))
    val m1 = WordPiece.trainFromHistogram(hist, numMerges = 10)
    val m2 = WordPiece.trainFromHistogram(hist, numMerges = 10)
    assert(m1.vocab == m2.vocab)
  }

  test("a complete alphabet never dead-ends: zero unk on the corpus") {
    val hist = Array(("ingest", 4L), ("testing", 3L), ("resting", 2L), ("rest", 1L))
    val m = WordPiece.trainFromHistogram(hist, numMerges = 8)
    hist.foreach { case (w, _) =>
      assert(m.encode(w) != null, s"dead end on $w")
    }
  }

  test("merge exhaustion stops early") {
    val m = WordPiece.trainFromHistogram(Array(("ab", 1L)), numMerges = 5)
    // no pair reaches count 2: vocab stays the alphabet
    assert(m.vocab == Set("a", "##b"))
  }

  // ---- the Spark surface ----

  test("encodeStats kernel matches the driver-side walk") {
    val docs = Seq((1L, "testing rest"), (2L, "")).toDF("doc_id", "text")
    val hist = Array(("ingest", 4L), ("testing", 3L), ("resting", 2L), ("rest", 1L))
    val m = WordPiece.trainFromHistogram(hist, numMerges = 10)
    val got = WordPiece.encodeStats(docs, col("doc_id"), col("text"), m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val words = Map(1L -> Seq("testing", "rest"), 2L -> Seq.empty[String])
    val exp = words.map { case (id, ws) =>
      val segs = ws.map(m.encode)
      id -> ((ws.length.toLong,
        segs.map(s => if (s == null) 1L else s.length.toLong).sum,
        segs.count(_ == null).toLong))
    }
    assert(got == exp)
  }

  test("q_wp runs end-to-end on the test corpus") {
    val out = SparkEntry.queries("q_wp")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1)) // every word is >= 1 piece
      assert(r.getLong(3) <= r.getLong(2))
    }
    // the histogram cap can drop rare words, but unk must stay a
    // vanishing fraction of the corpus
    val (p, u) = rows.foldLeft((0L, 0L)) { case ((a, b), r) =>
      (a + r.getLong(2), b + r.getLong(3)) }
    assert(u.toDouble / p < 0.02, s"unk=$u of pieces=$p")
  }
}
