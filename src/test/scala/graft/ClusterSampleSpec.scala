package graft

import graft.vector.{ClusterSample, IvfAnn, Similarity}
import org.apache.spark.sql.functions._

class ClusterSampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("per-cell quotas are exact: min(k, cell size) rows per cell") {
    val k = 7
    val got = ClusterSample.sample(sfDir + "#css1", emb, nlist = 8, k = k)
    val (assigned, _) = IvfAnn.quantizeCached(sfDir + "#css1", emb, 8)
    val sizes = assigned.groupBy("cell").count()
      .as[(Int, Long)].collect().toMap
    val kept = got.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(kept.keySet == sizes.keySet, "every non-empty cell is represented")
    kept.foreach { case (cell, n) =>
      assert(n == math.min(k.toLong, sizes(cell)), s"cell $cell") }
  }

  test("kept ids are a deterministic subset of their cells") {
    val a = ClusterSample.sample(sfDir + "#css2", emb, nlist = 8, k = 5)
      .as[(Long, Int)].collect().toSet
    val b = ClusterSample.sample(sfDir + "#css2", emb.repartition(7),
        nlist = 8, k = 5).as[(Long, Int)].collect().toSet
    assert(a == b, "partitioning must not change the selection")
    val (assigned, _) = IvfAnn.quantizeCached(sfDir + "#css2", emb, 8)
    val cellOf = assigned.as[(Long, Int)].collect().toMap
    a.foreach { case (id, cell) => assert(cellOf(id) == cell) }
  }

  test("balance: no cell exceeds the quota even when raw sizes are skewed") {
    val got = ClusterSample.sample(sfDir + "#css3", emb, nlist = 4, k = 10)
    val max = got.groupBy("cell").count()
      .agg(org.apache.spark.sql.functions.max("count"))
      .as[Long].collect().head
    assert(max <= 10)
  }

  test("hard negatives: never the query itself, never the query's label") {
    val neg = Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5), 5)
      .as[(Long, Int, Long, Int)].collect()
    val labelOf = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(neg.nonEmpty)
    neg.foreach { case (q, _, n, nl) =>
      assert(n != q)
      assert(nl == labelOf(n))
      assert(nl != labelOf(q), "negative must carry a different label")
    }
    // per query: ranks are 1..k and similarity-sorted vs a brute check
    val byQ = neg.groupBy(_._1)
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length)) }
  }
}
