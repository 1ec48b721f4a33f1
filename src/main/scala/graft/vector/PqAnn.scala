package graft.vector

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest neighbour (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): the billion-vector
  * serving shape. IVF cells prune WHICH vectors a query considers
  * ([[IvfAnn]]); product quantization compresses WHAT is read per
  * candidate — each vector is stored as `m` one-byte-ish codes
  * (subspace codebook indices) instead of `dim` floats, and candidate
  * scoring reads only the codes via a per-query lookup table (ADC,
  * asymmetric distance computation). At 100 TB the candidate scan is
  * the dominant I/O; PQ cuts it ~dim·4/m bytes per row, which is the
  * difference between an in-memory index and re-reading the corpus.
  *
  * Spark shape: codebooks are index-build artifacts (m·ksub·dsub
  * floats — driver/broadcast-bounded by construction, like the IVF
  * centroids and the bigram model), so both encoding and the ADC
  * table are MAP-SIDE literal-array expressions over the codegen'd
  * [[graft.functions.DotProduct]] — no shuffle is added to either
  * pass. The ADC scan ranks candidates on codes alone
  * (the codegen AdcSum lookup loop), keeps `rerank·k` survivors per query, and
  * only the survivors' full embeddings are joined back for the exact
  * cosine final ranking — so results degrade gracefully: with every
  * cell probed and rerank covering the corpus the output EQUALS
  * [[Similarity.bruteTopK]].
  */
object PqAnn {

  /** Train per-subspace codebooks: KMeans over the mi-th `dsub`-wide
    * slice of the corpus. Returns (m, code, c_sub float[dsub]) —
    * m·ksub rows, an index artifact (store it next to the IVF
    * centroids). `sampleFraction` bounds training at scale. */
  def train(corpus: DataFrame, dim: Int, m: Int, ksub: Int,
            sampleFraction: Double = 1.0): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub >= 2)
    val dsub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    (0 until m).flatMap { mi =>
      val sub = corpus.select(
        array_to_vector(slice(col("embedding"), mi * dsub + 1, dsub)).as("features"))
      val trainSet =
        if (sampleFraction >= 1.0) sub
        else sub.sample(withReplacement = false, sampleFraction, seed = 42L + mi)
      val model = new KMeans().setK(ksub).setSeed(42L + mi).setMaxIter(10).fit(trainSet)
      model.clusterCenters.zipWithIndex.map { case (c, code) =>
        (mi, code, c.toArray.map(_.toFloat))
      }
    }.toDF("m", "code", "c_sub")
  }

  /** Collect a codebook DataFrame to the driver-side [m][code][dsub]
    * literal form the map-side expressions consume. */
  def collectBook(codebook: DataFrame): Array[Array[Array[Float]]] = {
    val rows = codebook.select(col("m"), col("code"), col("c_sub")).collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    val out = Array.ofDim[Array[Float]](m, ksub)
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getSeq[Float](2).toArray)
    out
  }

  /** PQ-encode: (vec_id, codes int[m], v_norm). Map-only — each
    * subspace's nearest codeword is argmin over ksub literal-dot
    * distances (|c|² − 2·s·c; |s|² is constant per row), first-minimum
    * tie-break, so encoding is deterministic. */
  def encode(corpus: DataFrame, book: Array[Array[Array[Float]]], dim: Int): DataFrame = {
    val m = book.length
    val dsub = dim / m
    val codeCols: Seq[Column] = (0 until m).map { mi =>
      val sub = slice(col("embedding"), mi * dsub + 1, dsub)
      val dists = array(book(mi).toIndexedSeq.map { c =>
        val cn2 = c.map(x => x.toDouble * x.toDouble).sum
        lit(cn2) - lit(2.0) * Similarity.dot(sub, typedlit(c))
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    corpus.select(col("vec_id"), array(codeCols: _*).as("codes"),
      Similarity.norm(col("embedding")).as("v_norm"))
  }

  /** The ADC lookup table as a column over a query embedding:
    * [m][ksub] partial dot products of the query's subvector with
    * every codeword, so a candidate's approximate dot is the sum of
    * its m code lookups. */
  private def adcTable(qEmb: Column, book: Array[Array[Array[Float]]], dim: Int): Column = {
    val m = book.length
    val dsub = dim / m
    array((0 until m).map { mi =>
      val sub = slice(qEmb, mi * dsub + 1, dsub)
      array(book(mi).toIndexedSeq.map(c => Similarity.dot(sub, typedlit(c))): _*)
    }: _*)
  }

  /** Top-k by IVF-probe → ADC scan → exact re-rank. `assigned`/`cents`
    * are the IVF index ([[IvfAnn.quantize]]), `encoded` is [[encode]]'s
    * output for the same corpus. Candidates from the `nprobe` nearest
    * cells are ranked by ADC approximate cosine (adc_dot/(|q|·|v|),
    * true norms stored at encode time); the top `rerank·k` per query
    * get exact-cosine scored. Output (q_id, rank, n_id) — the
    * [[Similarity.bruteTopK]] contract. */
  def topKWith(assigned: DataFrame, cents: DataFrame, encoded: DataFrame,
               book: Array[Array[Array[Float]]],
               corpus: DataFrame, queries: DataFrame,
               k: Int, dim: Int, nprobe: Int, rerank: Int = 4): DataFrame = {
    require(k >= 1 && nprobe >= 1 && rerank >= 1)
    // IVF probe: nprobe nearest cells per query (same geometry as
    // IvfAnn.topKWith — |c|² − 2 q·c ranks cells).
    val qCells = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .withColumn("_score",
        col("c_norm2") - lit(2.0) * Similarity.dot(col("q_emb"), col("c_emb")))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("_score"), col("cell"))))
      .filter(col("_r") <= nprobe)
      .select(col("q_id"), col("cell"))
    val cand = assigned.join(broadcast(qCells), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id")).distinct()
    // ADC scan: codes join + map-side table-lookup sum; the query side
    // (table included) is broadcast, the corpus side moves only codes.
    val q = broadcast(queries.select(col("vec_id").as("q_id"),
      adcTable(col("embedding"), book, dim).as("_tab"),
      Similarity.norm(col("embedding")).as("q_norm")))
    val adc = cand.join(encoded.select(col("vec_id").as("n_id"), col("codes"), col("v_norm")),
        Seq("n_id"))
      .join(q, Seq("q_id"))
      .withColumn("_adc",
        graft.functions.AdcSum(col("codes"), col("_tab"))
          / (col("q_norm") * col("v_norm")))
    val surv = adc.withColumn("_ar", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("_adc").desc, col("n_id"))))
      .filter(col("_ar") <= rerank.toLong * k)
      .select(col("q_id"), col("n_id"))
    // exact re-rank: only survivors' embeddings are read back
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      Similarity.norm(col("embedding")).as("n_norm"))
    val qe = broadcast(queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), Similarity.norm(col("embedding")).as("q_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    surv.join(c, Seq("n_id")).join(qe, Seq("q_id"))
      .withColumn("sim",
        Similarity.dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, Int, Int, Int, Double),
    (Array[Array[Array[Float]]], DataFrame)]()

  private val evictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()

  /** Build-once PQ index reuse across query batches over the same
    * corpus — the same serving-shape stand-in as
    * [[IvfAnn.quantizeCached]]: the codebooks (m KMeans fits) and the
    * encoded (vec_id, codes, v_norm) table are index-build artifacts a
    * real deployment writes once and queries forever, so repeated
    * batches pay only the probe + ADC joins. Keyed by session +
    * caller-supplied corpus identity + all training parameters;
    * evicted when the owning context shuts down. */
  def encodeCached(key: String, corpus: DataFrame, dim: Int, m: Int,
                   ksub: Int, sampleFraction: Double = 1.0)
      : (Array[Array[Array[Float]]], DataFrame) = {
    val session = corpus.sparkSession
    if (evictionHooked.add(session)) {
      session.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            cache.keySet.removeIf(_._1 eq session)
            evictionHooked.remove(session)
          }
        })
    }
    cache.computeIfAbsent((session, key, dim, m, ksub, sampleFraction), _ => {
      val book = collectBook(train(corpus, dim, m, ksub, sampleFraction))
      val encoded = encode(corpus, book, dim)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (book, encoded)
    })
  }

  /** Convenience: build the full IVF-PQ index and search. Serving
    * builds once and queries forever — this is the test/bench entry. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
           nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
           rerank: Int = 4, sampleFraction: Double = 1.0): DataFrame = {
    val (assigned, cents) = IvfAnn.quantize(corpus, nlist, sampleFraction)
    val book = collectBook(train(corpus, dim, m, ksub, sampleFraction))
    val encoded = encode(corpus, book, dim)
    topKWith(assigned, cents, encoded, book, corpus, queries, k, dim, nprobe, rerank)
  }
}
