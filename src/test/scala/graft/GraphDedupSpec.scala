package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.vector.{GraphDedup, Similarity}

class GraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // exact ≥threshold cosine pairs by brute force (test corpus is tiny)
  private def exactPairs(threshold: Double): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", Similarity.dot(col("a.embedding"), col("b.embedding"))
        / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
  }

  test("graph clusters equal exact-threshold clusters at the registry config") {
    // t=0.4 keeps the max near-dup degree well under k=10 on every
    // test corpus (measured: 3 at sf0.001/sf0.01, 6 at sf0.1), so the
    // TRUE top-10 graph contains every qualifying pair; this pins that
    // the DESCENT graph found them too on the spec corpus
    val got = GraphDedup.clusters(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val want = Dedup.clusters(emb, col("vec_id"), exactPairs(0.4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(got == want)
    // and the clustering is non-trivial on this corpus
    assert(got.exists { case (id, canon, _) => id != canon })
  }

  test("every vector appears once; canonical is the component minimum") {
    val c = GraphDedup.clusters(emb, threshold = 0.4, k = 6,
      maxRounds = 4).cache()
    assert(c.count() == emb.count())
    assert(c.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
    val badCanon = c.groupBy("canonical_id")
      .agg(min(col("vec_id")).as("mn"))
      .filter(col("canonical_id") =!= col("mn"))
    assert(badCanon.count() == 0)
    // keep flags exactly the canonicals
    assert(c.filter((col("vec_id") === col("canonical_id")) =!=
      (col("keep") === 1)).count() == 0)
    c.unpersist()
  }

  test("an unreachable threshold yields all-singleton clusters") {
    val c = GraphDedup.clusters(emb, threshold = 0.999, k = 5,
      maxRounds = 2)
    assert(c.filter(col("vec_id") =!= col("canonical_id")).count() == 0)
  }
}
