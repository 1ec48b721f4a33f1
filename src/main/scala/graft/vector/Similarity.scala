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

  /** Random-hyperplane LSH buckets: `tables` independent hash tables of
    * `planes` sign-projections each. Returns (vec_id, t, bucket).
    * Hyperplane components are deterministic ±1 from xxhash64 so buckets
    * are stable across runs. The plane table (tables*planes*dim rows) is
    * broadcast; the corpus is scanned once. */
  def hyperplaneBuckets(vecs: DataFrame, dim: Int, planes: Int, tables: Int): DataFrame = {
    val spark = vecs.sparkSession
    val planeTab = broadcast(spark.range(tables.toLong * planes * dim).select(
      expr(s"id div ${planes * dim}").as("t"),
      expr(s"(id div $dim) % $planes").as("j"),
      expr(s"id % $dim").as("i"),
      when(pmod(xxhash64(col("id")), lit(2)) === 0, 1.0).otherwise(-1.0).as("sign")))
    vecs.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .join(planeTab, "i")
      .groupBy(col("vec_id"), col("t"), col("j"))
      .agg(sum(col("x") * col("sign")).as("s"))
      .groupBy(col("vec_id"), col("t"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(1, cast(j as int))")).otherwise(0L))
        .as("bucket"))
  }

  /** Approximate cosine top-k — the 100 TB path: candidates are corpus
    * vectors sharing an LSH bucket with the query in any table
    * (candidate count ~ corpus/2^planes per table), then exact cosine
    * ranks the candidates. Recall grows with `tables`. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              planes: Int = 6, tables: Int = 16): DataFrame = {
    val cb = hyperplaneBuckets(corpus, dim, planes, tables)
    val qb = hyperplaneBuckets(queries, dim, planes, tables)
    val c = corpus.join(cb, "vec_id")
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        norm(col("embedding")).as("n_norm"), col("t"), col("bucket"))
    val q = broadcast(queries.join(qb, "vec_id")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_norm"), col("t"), col("bucket")))
    val cand = c.join(q, Seq("t", "bucket")).filter(col("n_id") =!= col("q_id"))
      .select("q_id", "q_emb", "q_norm", "n_id", "n_emb", "n_norm").distinct()
    val scored = cand.withColumn("sim",
      dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** Embedding-cosine near-duplicate pairs — dedup by vector
    * similarity: LSH buckets generate candidates (no all-pairs join),
    * exact cosine verifies against the threshold. The scale counterpart
    * of `Dedup.jaccardPairs` for embedded content. */
  def cosineDupPairs(vecs: DataFrame, dim: Int, threshold: Double,
                     planes: Int = 6, tables: Int = 16): DataFrame = {
    val b = hyperplaneBuckets(vecs, dim, planes, tables)
    val v = vecs.join(b, "vec_id")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"),
        col("t"), col("bucket"))
    v.as("a").join(v.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"),
        col("a.embedding").as("e1"), col("b.embedding").as("e2"),
        col("a.nrm").as("n1"), col("b.nrm").as("n2"))
      .distinct()
      .withColumn("sim", dot(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("sim") >= threshold)
      .select("d1", "d2", "sim")
  }

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
