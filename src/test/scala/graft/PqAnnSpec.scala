package graft

import org.apache.spark.sql.functions._

import graft.vector.{IvfAnn, PqAnn, Similarity}

/** [[graft.vector.PqAnn]] — IVF-PQ ANN: encoding picks the nearest
  * codeword, ADC ordering is exact when vectors sit on the codebook,
  * the full pipeline degrades to brute-force parity when nothing is
  * pruned, and recall on the real embeddings table beats the bar. */
class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  test("encode picks the nearest codeword per subspace, first-min ties") {
    val book: Array[Array[Array[Float]]] = Array(
      Array(Array(0f, 0f), Array(1f, 1f)),
      Array(Array(0f, 1f), Array(2f, 2f)))
    val corpus = Seq(
      (1L, Seq(0.9f, 0.9f, 1.9f, 1.9f)), // near [1,1] and [2,2]
      (2L, Seq(0.1f, -0.1f, 0f, 1f)),    // near [0,0] and [0,1]
      (3L, Seq(0.5f, 0.5f, 1.5f, 1.8f))  // 0.5,0.5 equidistant -> first (code 0)
    ).toDF("vec_id", "embedding")
    val got = PqAnn.encode(corpus, book, dim = 4)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) === Seq(1, 1))
    assert(got(2L) === Seq(0, 0))
    assert(got(3L) === Seq(0, 1))
  }

  test("ADC ranking is exact for on-codebook vectors (rerank=1, k=1)") {
    // corpus vectors are concatenations of codewords -> PQ encoding is
    // lossless, so the ADC scan's top-1 must equal exact cosine top-1
    // even though only ONE candidate survives to the exact re-rank.
    val words = Array(Array(1f, 0f), Array(0f, 1f), Array(1f, 1f), Array(2f, 1f))
    val book = Array(words, words)
    val corpus = (for {
      a <- words.indices; b <- words.indices
    } yield ((a * words.length + b).toLong, (words(a) ++ words(b)).toSeq))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(0.9f, 0.1f, 1.8f, 1.1f)),
      (101L, Seq(0.1f, 1.1f, 0.9f, 1.0f))).toDF("vec_id", "embedding")
    val (assigned, cents) = IvfAnn.quantize(corpus, nlist = 2)
    val encoded = PqAnn.encode(corpus, book, dim = 4)
    val got = PqAnn.topKWith(assigned, cents, encoded, book, corpus, queries,
        k = 1, dim = 4, nprobe = 2, rerank = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val brute = Similarity.bruteTopK(corpus, queries, 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === brute)
  }

  test("nprobe=nlist with covering rerank equals brute force exactly") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    val k = 4
    val got = PqAnn.topK(corpus, queries, k, dim = 8,
        nlist = 4, nprobe = 4, m = 4, ksub = 8, rerank = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteTopK(corpus, queries, k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === brute)
  }

  test("embeddings-table recall@10: rerank is the recall lever") {
    // The driver's embeddings are near-random 64-dim vectors: the
    // inter-point cosine spread (~1/sqrt(64)) is comparable to the PQ
    // quantization error, so the ADC prefilter needs generous rerank
    // here (structured corpora quantize far better). The IVF probe
    // itself holds ~0.94; assert the ADC stage's monotone recovery.
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallAt(rr: Int): Double = {
      val got = PqAnn.topK(emb, queries, 10, dim = 64,
          nlist = 8, nprobe = 4, m = 8, ksub = 16, rerank = rr)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (got & brute).size.toDouble / brute.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16)
    info(s"recall@10 rerank=4: $r4, rerank=16: $r16")
    assert(r4 >= 0.5, s"rerank=4 recall@10 = $r4")
    assert(r16 >= 0.8, s"rerank=16 recall@10 = $r16")
    assert(r16 >= r4)
  }
}
