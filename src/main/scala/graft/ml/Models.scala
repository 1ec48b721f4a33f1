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
