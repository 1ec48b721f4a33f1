package graft

import graft.text.TextFeatures
import org.apache.spark.sql.functions._

class TrigramSpec extends SparkSpec {
  import spark.implicits._

  test("char-trigram cross-entropy: hand-computed two-doc corpus") {
    // normalized docs "abc" and "xyz": model {abc:1, xyz:1}, tot=2,
    // V=2; every trigram's smoothed logprob = ln(2/4) -> H = -ln(0.5)
    val df = Seq((1L, "abc"), (2L, "xyz")).toDF("doc_id", "text")
    val got = TextFeatures.charTrigramEntropy(df, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toList
    val h = math.floor(-math.log(0.5) * 1e6 + 0.5) / 1e6
    assert(got == List((1L, 1L, h), (2L, 1L, h)))
    // a 2-char doc has no trigram and is out of scope
    val short = Seq((1L, "abcd"), (2L, "ab")).toDF("doc_id", "text")
    assert(TextFeatures.charTrigramEntropy(short, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("trigram sees context bigrams miss: pair-plausible junk scores as outlier") {
    // "ababab..." uses only bigrams {ab, ba} that also dominate the
    // inliers, but its TRIGRAM set {aba, bab} never appears in them
    val inliers = (1 to 8).map(i => (i.toLong, "abc abc abc abc abc"))
    val junk = (99L, "ababababababababab")
    val df = (inliers :+ junk).toDF("doc_id", "text")
    val e3 = TextFeatures.charTrigramEntropy(df, col("doc_id"), col("text"))
      .select("doc_id", "cross_entropy3").as[(Long, Double)].collect().toMap
    assert(e3(99L) > e3(1L), "trigram model must flag the outlier")
  }

  test("held-out scoring: unseen grams hit the smoothed floor; strict mode still throws") {
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    // model trained on one "abc" occurrence: tot=1, v=1, floor=ln(1/2)
    val floor = StrictMath.log(1.0 / 2.0)
    val tgAbc = ('a'.toLong << 32) | ('b'.toLong << 16) | 'c'.toLong
    val held = Seq((1L, "abd")).toDF("doc_id", "t")
      .select(col("doc_id"), graft.functions.TrigramCounts(col("t")).as("a"))
    val lenient = new graft.functions.TrigramModel(
      Array(tgAbc), Array(StrictMath.log(2.0 / 2.0)), floor)
    val got = held
      .select(graft.functions.TrigramScore(col("a"), lenient).as("s"))
      .select(col("s.n"), col("s.lp")).as[(Long, Double)].head()
    assert(got._1 == 1L)
    assert(math.abs(got._2 - floor) < 1e-7, "unseen trigram scores at the floor")
    val strict = new graft.functions.TrigramModel(
      Array(tgAbc), Array(StrictMath.log(2.0 / 2.0)))
    val ex = intercept[Throwable] {
      held.select(graft.functions.TrigramScore(col("a"), strict).as("s")).collect()
    }
    assert(causes(ex).exists(_.isInstanceOf[IllegalStateException]),
      "the self-trained parity path keeps the model/corpus-mismatch throw")
    // the bigram kernel shares the design — same floor semantics
    val bgAb = ('a' << 16) | 'b'
    val heldBg = Seq((1L, "ac")).toDF("doc_id", "t")
      .select(col("doc_id"), graft.functions.BigramCounts(col("t")).as("a"))
    val bgLenient = new graft.functions.BigramModel(
      Array(bgAb), Array(StrictMath.log(1.0)), floor)
    val gotBg = heldBg
      .select(graft.functions.BigramScore(col("a"), bgLenient).as("s"))
      .select(col("s.lp")).as[Double].head()
    assert(math.abs(gotBg - floor) < 1e-7, "unseen bigram scores at the floor")
  }

  test("cross-corpus scoring: hand-computed floor case and reference-likeness ordering") {
    import graft.text.TextFeatures
    // reference "abc": model {ab:1, bc:1}, tot=2, V=2, floor=ln(1/4).
    // scoring "abd": ab seen -> ln(2/4); bd unseen -> floor.
    val ref = Seq((100L, "abc")).toDF("doc_id", "text")
    val got = TextFeatures.charBigramEntropyAgainst(
        ref, col("text"),
        Seq((1L, "abd")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().toList
    val q8 = (x: Double) => new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
    val expCe = math.floor(
      -(q8(math.log(0.5)) + q8(math.log(0.25))) / 2 * 1e6 + 0.5) / 1e6
    assert(got == List((1L, 2L, expCe)))
    // a reference-like doc must score lower than alphabet junk
    val ref2 = (1 to 6).map(i => (100L + i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val scored = TextFeatures.charBigramEntropyAgainst(
        ref2, col("text"),
        Seq((1L, "the cat sat on a mat"), (2L, "zqxv jkwp zzqq xxvv"))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(scored(1L) < scored(2L),
      "reference-like text scores lower cross-entropy than junk")
  }

  test("TrigramCounts kernel matches the naive formulation on real docs") {
    val docs = Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", "#").as("t"))
      .filter(length(col("t")) >= 3)
    val naive = docs.as[(Long, String)].collect().map { case (id, t) =>
      id -> t.sliding(3).toSeq.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
    }.toMap
    val got = docs.select(col("doc_id"),
        graft.functions.TrigramCounts(col("t")).as("a"))
      .select(col("doc_id"), explode(col("a")).as("e"))
      .select(col("doc_id"), col("e.tg"), col("e.k"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map { case (_, tg, k) =>
        val s = new String(Array(
          ((tg >> 32) & 0xffff).toChar, ((tg >> 16) & 0xffff).toChar,
          (tg & 0xffff).toChar))
        s -> k
      }.toMap).toMap
    assert(got.keySet == naive.keySet)
    got.foreach { case (id, m) => assert(m == naive(id), s"doc $id") }
  }
}
