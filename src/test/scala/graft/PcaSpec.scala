package graft

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** PCA reduction invariants (component signs are implementation
  * choices, so everything here is sign-independent). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  private def fit(k: Int) = new org.apache.spark.ml.feature.PCA()
    .setK(k).setInputCol("features").setOutputCol("pca")
    .fit(emb.select(array_to_vector(col("embedding")).as("features")))

  test("basis is orthonormal") {
    val pc = fit(8).pc // dim x k, column-major
    val d = pc.numRows; val k = pc.numCols
    for (i <- 0 until k; j <- i until k) {
      val dot = (0 until d).map(r => pc(r, i) * pc(r, j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"pc$i . pc$j")
    }
  }

  test("captured variance is ordered and grows with k toward total") {
    val ev8 = fit(8).explainedVariance.toArray
    assert(ev8.sliding(2).forall { case Array(a, b) => a >= b - 1e-12 },
      "per-component explained variance must be non-increasing")
    val ev4 = fit(4).explainedVariance.toArray
    assert(ev4.sum <= ev8.sum + 1e-12)
    // the leading component must actually capture something
    assert(ev8.head > 0.0)
  }

  test("projection output: one row per vector, k scalar columns, deterministic") {
    val a = graft.ml.Models.pcaEmbeddings(emb, 8)
    assert(a.columns.toSeq == "vec_id" +: (1 to 8).map(i => s"pc$i"))
    assert(a.count() == emb.count())
    val b = graft.ml.Models.pcaEmbeddings(emb.repartition(7), 8)
    def norm2 = (r: org.apache.spark.sql.Row) =>
      r.getLong(0) -> (1 to 8).map(i => { val v = r.getDouble(i); v * v }).sum
    // per-row projected ENERGY is basis-sign-independent and must be
    // partitioning-invariant (up to the 1e-4 rounding the op applies)
    val ea = a.collect().map(norm2).toMap
    val eb = b.collect().map(norm2).toMap
    assert(ea.keySet == eb.keySet)
    ea.foreach { case (id, e) => assert(math.abs(e - eb(id)) < 1e-2, s"vec $id") }
  }

  test("mean reconstruction error shrinks as k grows") {
    def err(k: Int): Double = {
      val model = fit(k)
      val pc = model.pc
      val d = pc.numRows
      val rows = emb.select(col("embedding")).as[Array[Float]].collect()
      rows.map { v =>
        val x = v.map(_.toDouble)
        val proj = (0 until k).map(c => (0 until d).map(r => x(r) * pc(r, c)).sum)
        val rec = (0 until d).map(r => (0 until k).map(c => proj(c) * pc(r, c)).sum)
        math.sqrt(x.indices.map(i => { val e = x(i) - rec(i); e * e }).sum)
      }.sum / rows.length
    }
    val e2 = err(2); val e8 = err(8)
    assert(e8 < e2, s"k=8 error $e8 must beat k=2 error $e2")
  }
}
