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
}
