package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search. Brute-force cosine top-k is the exact
  * baseline (queries broadcast against the corpus — linear scans, no
  * shuffle of the big side); LSH bucketing is the approximate scale
  * path (round 2).
  */
object Similarity {

  /** Left-to-right double-precision dot product of two float arrays —
    * codegen'd higher-order functions, deterministic accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). The query side must be small; it is
    * broadcast so the corpus is scanned once with no shuffle. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      norm(col("embedding")).as("n_norm"))
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_norm")))
    val scored = c.join(q, col("n_id") =!= col("q_id"))
      .withColumn("sim", dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }
}
