package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib stages downstream of feature extraction — the reference's
  * analytical endpoint is phenotype classification/clustering over the
  * CellPhe feature table (the CellPhe package trains classifiers on the
  * time-series features; see also bin/segmentation_qc.qmd's clustering
  * of cell populations). Here the embeddings table stands in for the
  * feature matrix. Everything is Dataset-native: `array_to_vector`
  * avoids a UDF for the array<float> -> Vector bridge.
  */
object Models {

  /** Deterministic train/test split on a hash of the id (stable across
    * runs and partitionings, unlike randomSplit). */
  def hashSplit(df: DataFrame, id: String, testMod: Int = 5): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(col(id)), lit(testMod))
    (df.filter(bucket =!= 0), df.filter(bucket === 0))
  }

  /** Multinomial logistic regression over the embedding vectors;
    * returns the test-set predictions (vec_id, label, prediction). */
  def classifyEmbeddings(embeddings: DataFrame): DataFrame = {
    val prepared = embeddings.select(col("vec_id"), col("label").cast("double").as("label"),
      array_to_vector(col("embedding")).as("features"))
    val (train, test) = hashSplit(prepared, "vec_id")
    val model = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setTol(1e-6)
      .fit(train)
    model.transform(test).select(col("vec_id"), col("label"), col("prediction"))
  }

  /** FastText-style text quality classifier — the FineWeb-Edu / DCLM
    * pattern: a cheap linear model over HASHED bag-of-token features
    * (the hashing trick bounds the feature space at `numFeatures`
    * regardless of vocabulary — no vocab build pass, no OOV) is
    * trained on weak labels and then scores the whole corpus map-only.
    * Training cost is the labeled slice; inference is one HashingTF +
    * one dot product per document — the only classifier shape that
    * runs at 100 TB. Features are token counts (binary=false), split
    * on whitespace lowercased — the same tokenization the quality and
    * langId kernels use. Returns every document with its weak label,
    * the model's prediction, and the positive-class probability
    * (rounded: LBFGS float reduction order is not bit-stable, the
    * decision and 4-decimal score are). */
  /** Train-once model cache. STALENESS CONTRACT (the quantizeCached
    * one): `cacheKey` is the CALLER'S PROMISE of corpus identity —
    * passing the same key for a different `docs` relation returns the
    * previously trained model unchanged (by design: repeated scoring
    * of one corpus is the serving pattern; a corpus revision needs a
    * new key). The key also folds in numFeatures and the text/label
    * EXPRESSIONS, so reusing a key with different columns or
    * hyperparameter surface trains a fresh entry rather than silently
    * serving a stale one. Entries are evicted on application end; a
    * session stopped mid-application keeps its (driver-sized) models
    * until then — the same declared bound quantizeCached carries. */
  private val clsCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, Int, String, String),
    org.apache.spark.ml.classification.LogisticRegressionModel]()
  private val clsEvictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()

  def textClassifier(docs: DataFrame, id: org.apache.spark.sql.Column,
                     text: org.apache.spark.sql.Column,
                     label: org.apache.spark.sql.Column,
                     numFeatures: Int = 1 << 18,
                     cacheKey: Option[String] = None): DataFrame = {
    val prepared = docs.select(id.as("doc_id"),
      split(lower(text), "\\s+").as("_toks"),
      label.cast("double").as("label"))
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("_toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
    val feat = tf.transform(prepared)
    def train() = {
      val (tr, _) = hashSplit(feat, "doc_id")
      new LogisticRegression()
        .setMaxIter(50).setRegParam(0.01).setTol(1e-6)
        .fit(tr)
    }
    // train-once per (session, corpus identity): the model is a
    // driver-sized artifact (numFeatures weights), the quantizeCached /
    // lmCached pattern — repeated scoring queries pay only the map-only
    // transform
    val model = cacheKey match {
      case None => train()
      case Some(k) =>
        val session = docs.sparkSession
        if (clsEvictionHooked.add(session)) {
          session.sparkContext.addSparkListener(
            new org.apache.spark.scheduler.SparkListener {
              override def onApplicationEnd(
                  end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
                clsCache.keySet.removeIf(_._1 eq session)
                clsEvictionHooked.remove(session)
              }
            })
        }
        // the full parameter surface as a TUPLE key (a delimited string
        // could collide when an expression's SQL contains the delimiter)
        clsCache.computeIfAbsent((session, k, numFeatures,
          org.apache.spark.sql.GraftBridge.expression(text).sql,
          org.apache.spark.sql.GraftBridge.expression(label).sql),
          _ => train())
    }
    model.transform(feat)
      .withColumn("_p1", org.apache.spark.ml.functions
        .vector_to_array(col("probability")).getItem(1))
      .select(col("doc_id"), col("label"), col("prediction"),
        graft.functions.Numeric.cround(col("_p1"), 4).as("score"))
  }

  /** KMeans phenotype clustering; returns (vec_id, cluster). */
  def clusterEmbeddings(embeddings: DataFrame, k: Int = 10): DataFrame = {
    val prepared = embeddings.select(col("vec_id"),
      array_to_vector(col("embedding")).as("features"))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(20).fit(prepared)
    model.transform(prepared).select(col("vec_id"), col("prediction").as("cluster"))
  }

  /** PCA dimensionality reduction of the embedding table — the
    * preprocessing step a billion-vector index runs before
    * quantization (PQ codebooks train better in a decorrelated,
    * energy-compacted basis; OPQ is PCA plus a rotation refinement).
    * Training is one covariance aggregate over the corpus (MLlib
    * computes it distributed; the k x dim basis is a driver-sized
    * artifact broadcast back), projection is map-only. Returns
    * (vec_id, pc1..pck) as SCALAR columns, rounded for cross-run
    * stability — component SIGNS are an SVD implementation choice, so
    * consumers must treat each column as defined up to sign (the spec
    * pins the invariant quantities: orthonormality, captured variance,
    * reconstruction error). */
  def pcaEmbeddings(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val prepared = embeddings.select(col("vec_id"),
      array_to_vector(col("embedding")).as("features"))
    val model = new org.apache.spark.ml.feature.PCA()
      .setK(k).setInputCol("features").setOutputCol("pca")
      .fit(prepared)
    val projected = model.transform(prepared)
      .select(col("vec_id"),
        org.apache.spark.ml.functions.vector_to_array(col("pca")).as("_p"))
    val comps = (1 to k).map(i => graft.functions.Numeric.cround(
      element_at(col("_p"), i), 4).as(s"pc$i"))
    projected.select(col("vec_id") +: comps: _*)
  }
}
