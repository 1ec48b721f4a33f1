package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-index persistence — the build-once/serve-forever contract a
  * billion-vector deployment actually runs: the expensive artifacts
  * (KMeans cells, PQ codebooks, encoded codes) are written ONCE as
  * parquet and every serving job loads them instead of retraining
  * (the in-session `quantizeCached`/`encodeCached` caches only live
  * as long as the session; this is the durable form).
  *
  * Layout is the serving layout, not a dump: the vector table is
  * PARTITIONED BY CELL, so an nprobe-cell query's `cell IN (...)`
  * filter becomes parquet PARTITION PRUNING — a 4-of-1024-cell probe
  * reads 0.4% of the corpus bytes (spec pins PartitionFilters in the
  * plan). Centroids and codebooks are tiny side tables.
  */
object IndexStore {

  /** Persist an IVF index: per-cell vector partitions + centroids.
    * `corpus` must carry (vec_id, embedding); `assigned`/`cents` are
    * [[IvfAnn.quantize]] outputs. */
  def saveIvf(dir: String, corpus: DataFrame,
              assigned: DataFrame, cents: DataFrame): Unit = {
    corpus.select(col("vec_id"), col("embedding"))
      .join(assigned, "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/vectors")
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Load an IVF index back as (assigned, cents, corpus) — drop-in for
    * [[IvfAnn.topKWith]]'s arguments. Both views read the ONE
    * partitioned vector table; a cell filter on either prunes
    * partitions. */
  def loadIvf(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val vectors = spark.read.parquet(s"$dir/vectors")
    (vectors.select(col("vec_id"), col("cell")),
      spark.read.parquet(s"$dir/centroids"),
      vectors.select(col("vec_id"), col("embedding")))
  }

  /** Load an IVF index EXTENDED by a streaming-append delta
    * ([[graft.streaming.VectorProbeStream.appendIvfStream]]'s output
    * at `deltaDir`): the same (assigned, cents, corpus) views over
    * base ∪ delta — drop-in for [[IvfAnn.topKWith]]. Both sides are
    * partitioned by cell, so an nprobe query's cell filter prunes
    * base and delta partitions alike; the centroids are the base's
    * (the delta was routed under the SAME frozen quantizer). */
  def loadIvfWithDelta(spark: SparkSession, dir: String,
                       deltaDir: String): (DataFrame, DataFrame, DataFrame) = {
    val base = spark.read.parquet(s"$dir/vectors")
      .select(col("vec_id"), col("embedding"), col("cell"))
    val delta = spark.read.parquet(deltaDir)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val vectors = base.union(delta)
    (vectors.select(col("vec_id"), col("cell")),
      spark.read.parquet(s"$dir/centroids"),
      vectors.select(col("vec_id"), col("embedding")))
  }

  /** Persist the PQ artifacts next to an IVF index: the [m][code]
    * codebook table and the per-vector codes. Codes co-partition by
    * cell when `encodedWithCell` carries one (the IVF-PQ serving
    * layout: the ADC scan of a probed cell reads only its partition). */
  def savePq(dir: String, codebook: DataFrame, encoded: DataFrame): Unit = {
    codebook.write.mode("overwrite").parquet(s"$dir/codebook")
    encoded.write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Load PQ artifacts: (codebook DF, encoded DF). Feed the codebook
    * through [[PqAnn.collectBook]] for the map-side literal form. */
  def loadPq(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/codebook"), spark.read.parquet(s"$dir/codes"))

  /** Persist an [[NnDescent]] K-NN graph: (vec_id, rank, n_id, sim)
    * rows plus a one-row meta table pinning the build parameters, so
    * a loader can verify it got the graph it asked for. The graph is
    * the expensive batch artifact of the graph-ANN family — built
    * once, served forever, like the IVF cells and PQ codebooks. */
  def saveKnn(dir: String, graph: DataFrame, k: Int): Unit = {
    val spark = graph.sparkSession
    import spark.implicits._
    graph.write.mode("overwrite").parquet(s"$dir/knn")
    Seq(k).toDF("k").write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a K-NN graph and its k, failing fast on a malformed meta
    * (the IncrementalMinHash loadIndex contract). */
  def loadKnn(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val meta = spark.read.parquet(s"$dir/meta").collect()
    require(meta.length == 1, s"knn meta at $dir/meta has ${meta.length} rows, expected 1")
    (spark.read.parquet(s"$dir/knn"), meta(0).getAs[Int]("k"))
  }
}
