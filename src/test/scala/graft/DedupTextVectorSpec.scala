package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, MinHashLSH}
import graft.text.TextFeatures
import graft.vector.Similarity

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps min id per duplicate group") {
    val df = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "cc")).toDF("doc_id", "text")
    val got = Dedup.exact(df, col("doc_id"), col("text"))
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
    val byHash = Dedup.exactByHash(df, col("doc_id"), col("text"))
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(byHash == got)
  }

  test("shingles: distinct k-grams, short docs yield none") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val got = Dedup.shingles(df, col("doc_id"), col("text"), 3)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("jaccard pairs: identical docs have jaccard 1.0") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(df, col("doc_id"), col("text"), 3, 0.5, 100L)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)))
  }

  test("clusters: transitive closure over pairs, canonical keep, singletons kept") {
    // pair evidence A~B, B~C (never A~C) plus an unrelated pair D~E:
    // one cluster {1,2,3} kept by 1, one {7,8} kept by 7, singleton 9
    val docs = Seq(1L, 2L, 3L, 7L, 8L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("d1", "d2")
    val got = Dedup.clusters(docs, col("doc_id"), pairs)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (7L, 7L, 1), (8L, 7L, 0), (9L, 9L, 1)))
  }

  test("clusters over real jaccard pairs: kept set is a maximal dup-free cover (sf0.001)") {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5, 1000L)
    val cl = Dedup.clusters(docs, col("doc_id"), pairs.select("d1", "d2"))
    val assign = cl.as[(Long, Long, Int)].collect()
    val byDoc = assign.map(a => a._1 -> a._2).toMap
    // every pair's endpoints share a canonical; exactly one keep per cluster
    pairs.select("d1", "d2").as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) split across clusters")
    }
    assign.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.count(_._3 == 1) == 1, s"cluster $canon keep count != 1")
      assert(members.map(_._1).min == canon, s"cluster $canon not labeled by min id")
    }
    assert(assign.length == docs.count())
  }

  test("minhash LSH pairs == exact jaccard pairs on real corpus (sf0.001)") {
    val docs = Tables.documents(spark, sfDir)
    val exact = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5, 1000L)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = MinHashLSH.nearDupPairs(docs, col("doc_id"), col("text"), 3, 64, 16, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // LSH candidates are verified by exact jaccard -> lsh is a subset;
    // with 16 bands x 4 rows recall at j>=0.5 is ~1 on this corpus.
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"missed: ${exact -- lsh}")
  }
}

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing guarantees shared fingerprints for shared substrings") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"another beginning $shared different end")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        explode(graft.functions.Winnow(col("text"), 8, 4)).as("fp"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    // any shared substring of length >= w+k-1 = 11 shares >= 1 fingerprint
    assert((fps(1L) & fps(2L)).nonEmpty)
  }

  test("short documents produce no fingerprints") {
    val df = Seq((1L, "tiny")).toDF("doc_id", "text")
    val n = df.select(explode(graft.functions.Winnow(col("text"), 8, 4))).count()
    assert(n == 0)
  }
}

class SimHashDedupSpec extends SparkSpec {
  import spark.implicits._

  test("banded simhash pairs == brute-force hamming filter (sf0.001)") {
    val docs = Tables.documents(spark, sfDir)
    val got = graft.dedup.SimHashDedup.nearDupPairs(docs, col("doc_id"), col("text"), 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val fps = docs.select(col("doc_id"),
        graft.functions.SimHash(col("text")).as("fp"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (d1, f1) <- fps; (d2, f2) <- fps
      if d1 < d2 && java.lang.Long.bitCount(f1 ^ f2) <= 3
    } yield (d1, d2)).toSet
    assert(got == brute) // pigeonhole banding is exact for hamming <= bands-1
    info(s"${got.size} simhash near-dup pairs")
  }

  test("HammingDistance expression") {
    val r = Seq((0x0FL, 0x00L)).toDF("a", "b")
      .select(graft.functions.HammingDistance(col("a"), col("b"))).as[Int].head()
    assert(r == 4)
  }
}

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("char-bigram cross-entropy: hand-computed two-doc corpus") {
    // normalized docs "ab" and "cd": model {ab:1, cd:1}, tot=2, V=2;
    // every bigram's smoothed logprob = ln(2/4) -> H = -ln(0.5)
    val df = Seq((1L, "ab"), (2L, "cd")).toDF("doc_id", "text")
    val got = TextFeatures.charBigramEntropy(df, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toList
    val h = math.floor(-math.log(0.5) * 1e6 + 0.5) / 1e6
    assert(got == List((1L, 1L, h), (2L, 1L, h)))
    // identical docs score LOWER (closer to the corpus) than an outlier
    val df2 = Seq((1L, "the cat sat"), (2L, "the cat sat"), (3L, "zq#xv!!"))
      .toDF("doc_id", "text")
    val e = TextFeatures.charBigramEntropy(df2, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(e(1L) == e(2L))
    assert(e(3L) > e(1L))
  }

  test("token stats on a known string") {
    val df = Seq((1L, "Hello world, 42 times!")).toDF("doc_id", "text")
    val r = TextFeatures.tokenStats(df, col("doc_id"), col("text"))
      .select("n_ws_tokens", "n_bpe_tokens", "n_alpha_tokens", "avg_token_len")
      .as[(Int, Int, Int, Double)].head()
    // ws: [Hello, world,, 42, times!] ; bpe: Hello world , 42 times ! = 6
    assert(r._1 == 4 && r._2 == 6 && r._3 == 3)
    assert(r._4 == round(19.0 / 4, 4))
  }

  private def round(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("TokenCounts matches the regex formulation on adversarial strings and real docs") {
    val tricky = Seq(
      "", " ", "  ", "a", " a", "a ", "\ta\nb\r", "a  b", "...", "a1b2",
      "42", "x!y?z", "tab\tsep", "ends with punct!", "!leading", "a-b_c",
      "\u000Bvt\u000B", "mixed 12ab!! 7 ...x"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val trickyDf = tricky.toDF("doc_id", "text")
    val realDf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    for (df <- Seq(trickyDf, realDf)) {
      val expected = df.select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).as("e_ws"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).as("e_bpe"),
        regexp_count(col("text"), lit("[A-Za-z]+")).as("e_alpha"),
        length(regexp_replace(col("text"), "\\s", "")).cast("long").as("e_nonws"))
      val got = df.select(col("doc_id"), graft.functions.TokenCounts(col("text")).as("tc"))
        .select(col("doc_id"), col("tc.n_ws_tokens").as("g_ws"),
          col("tc.n_bpe_tokens").as("g_bpe"), col("tc.n_alpha_tokens").as("g_alpha"),
          col("tc.n_nonws_chars").as("g_nonws"))
      val mismatches = expected.join(got, Seq("doc_id"))
        .filter(col("e_ws") =!= col("g_ws") || col("e_bpe") =!= col("g_bpe") ||
          col("e_alpha") =!= col("g_alpha") || col("e_nonws") =!= col("g_nonws"))
        .collect()
      assert(mismatches.isEmpty, mismatches.take(3).mkString("; "))
    }
  }

  test("stratified sampling: deterministic, per-group rates, default pass-through") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sampled = TextFeatures.sampleStratified(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.25), 1.0)
    val again = TextFeatures.sampleStratified(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.25), 1.0)
    // bit-deterministic: identical keep set on re-run
    assert(sampled.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // non-rated groups pass through untouched; rated group is thinned
    full.foreach { case (l, n) =>
      if (l == "en") {
        val rate = byLang.getOrElse("en", 0L).toDouble / n
        assert(rate > 0.1 && rate < 0.4, s"en keep rate $rate far from 0.25")
      } else assert(byLang(l) == n, s"group $l was sampled but has no rate")
    }
  }

  test("quality flags short docs") {
    val df = Seq((1L, "too short"), (2L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val r = TextFeatures.quality(df, col("doc_id"), col("text"))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(!r(1L) && r(2L))
  }

  test("langId marks CJK as zh and marker-free text as und") {
    val df = Seq((1L, "你好 world"), (2L, "zzz qqq"), (3L, "the cat is here"))
      .toDF("doc_id", "text")
    val r = TextFeatures.langId(df, col("doc_id"), col("text"))
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "zh", 2L -> "und", 3L -> "en"))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force cosine top-k ranks exact neighbours") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteTopK(vecs, vecs.filter(col("vec_id") === 0), 3)
      .orderBy("rank").select("n_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("dot/norm helpers") {
    val df = Seq((Array(3.0f, 4.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val (d, n) = df.select(Similarity.dot(col("a"), col("b")), Similarity.norm(col("a")))
      .as[(Double, Double)].head()
    assert(d == 3.0 && n == 5.0)
  }
}

class MultimodalSpec extends SparkSpec {
  test("box downsample: hand-computed 4x4 -> 2x2 and partial blocks") {
    // 4x4 ramp 0..15, factor 2: block means (2.5, 4.5, 10.5, 12.5)
    val px = (0 until 16).map(_.toDouble).toArray
    val (o, w, h) = graft.multimodal.Texture.boxDownsample(px, 4, 4, 2)
    assert((w, h) == (2, 2))
    assert(o.toSeq == Seq(2.5, 4.5, 10.5, 12.5))
    // 3x3, factor 2: trailing partial blocks average what they cover
    val px3 = (0 until 9).map(_.toDouble).toArray
    val (o3, w3, h3) = graft.multimodal.Texture.boxDownsample(px3, 3, 3, 2)
    assert((w3, h3) == (2, 2))
    assert(o3.toSeq == Seq((0.0+1+3+4)/4, (2.0+5)/2, (6.0+7)/2, 8.0))
    // factor 1 is identity
    assert(graft.multimodal.Texture.boxDownsample(px, 4, 4, 1)._1 eq px)
  }

  test("downsampled frame features stay deterministic; resize changes texture only") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val full = graft.multimodal.Binary.sampleFrameFeatures(spark,
      graft.multimodal.Binary.withPayload(docs), everyK = 2).collect()
    val down = graft.multimodal.Binary.sampleFrameFeatures(spark,
      graft.multimodal.Binary.withPayload(docs), everyK = 2, downsampleBy = 2).collect()
    val fullBy = full.map(f => (f.doc_id, f.frame_idx) -> f).toMap
    assert(down.length == full.length)
    down.foreach { d =>
      val f = fullBy((d.doc_id, d.frame_idx))
      // identity-of-frame fields unchanged by the resize
      assert(d.mean_px == f.mean_px && d.checksum == f.checksum)
    }
    // resize actually ran: texture differs somewhere
    assert(down.exists(d => d.tex_lh != fullBy((d.doc_id, d.frame_idx)).tex_lh))
  }

  test("binary decode stub is deterministic with stable schema") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val out = graft.multimodal.Binary.decodeMeta(spark, graft.multimodal.Binary.withPayload(docs))
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(m => m.width >= 16 && m.height >= 16 && m.n_bytes > 0))
    val again = graft.multimodal.Binary.decodeMeta(spark,
      graft.multimodal.Binary.withPayload(docs)).collect()
    assert(rows.map(_.checksum).sorted.sameElements(again.map(_.checksum).sorted))
  }

  test("2-D Haar texture energies: hand-computed bands") {
    // gradient 4x4: rows differ by 4 -> pure horizontal-edge energy
    val grad = Array.tabulate(16)(i => (i + 1).toDouble)
    val (lh, hl, hh) = graft.multimodal.Texture.haar2dEnergies(grad, 4, 4)
    assert((lh, hl, hh) == ((16.0, 1.0, 0.0)))
    // 2x2 checkerboard -> pure diagonal energy
    val (clh, chl, chh) = graft.multimodal.Texture.haar2dEnergies(
      Array(1.0, 0.0, 0.0, 1.0), 2, 2)
    assert((clh, chl, chh) == ((0.0, 0.0, 1.0)))
    // constant image -> zero everywhere
    val (zl, zm, zh) = graft.multimodal.Texture.haar2dEnergies(Array.fill(16)(7.0), 4, 4)
    assert((zl, zm, zh) == ((0.0, 0.0, 0.0)))
  }

  test("frame sampling: one row per sampled frame, payload decoded in-executor") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val withP = graft.multimodal.Binary.withPayload(docs)
    val meta = graft.multimodal.Binary.decodeMeta(spark, withP).collect()
      .map(m => m.doc_id -> m.n_frames).toMap
    val frames = graft.multimodal.Binary.sampleFrameFeatures(spark, withP, everyK = 2).collect()
    val expected = meta.values.map(n => (n + 1) / 2).sum
    assert(frames.length == expected, s"${frames.length} != $expected")
    assert(frames.forall(f => f.frame_idx % 2 == 0 && f.frame_idx < meta(f.doc_id)))
    val again = graft.multimodal.Binary.sampleFrameFeatures(spark, withP, everyK = 2).collect()
    assert(frames.map(_.checksum).sorted.sameElements(again.map(_.checksum).sorted))
  }
}
