package graft

import org.apache.spark.sql.functions._

import graft.vector.{Pooling, Quantize}

class QuantPoolSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("mean pooling: hand-computed group means at dimension grain") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)), (2, Seq(5.0f, 6.0f)))
      .toDF("grp", "e")
    val got = Pooling.meanByGroup(df, col("grp"), col("e"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set((1, 0, 2L, 2.0), (1, 1, 2L, 3.0),
      (2, 0, 1L, 5.0), (2, 1, 1L, 6.0)))
  }

  test("pooling is partitioning-invariant on the real embeddings") {
    val a = Pooling.meanByGroup(emb, col("label"), col("embedding"))
      .collect().map(_.toString).sorted.toSeq
    val b = Pooling.meanByGroup(emb.repartition(7), col("label"),
        col("embedding"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("int8: extremes land on ±127, zero vector quantizes to zeros at scale 0") {
    val df = Seq((1L, Seq(1.0f, -1.0f, 0.5f)), (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "e")
    val got = Quantize.int8(df, col("vec_id"), col("e"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set((1L, 0, 127L, 1.0), (1L, 1, -127L, 1.0),
      (1L, 2, 64L, 1.0), (2L, 0, 0L, 0.0), (2L, 1, 0L, 0.0),
      (2L, 2, 0L, 0.0)))
  }

  test("reconstruction error is within the half-step bound on real embeddings") {
    val q = Quantize.int8(emb, col("vec_id"), col("embedding"))
    val back = q.join(
        emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x"))),
        Seq("vec_id", "i"))
      .withColumn("err", abs(col("q").cast("double") * col("scale") / 127.0
        - col("x").cast("double")))
      .withColumn("bound", col("scale") / 254.0 + 1e-12)
    assert(back.filter(col("err") > col("bound")).count() == 0)
    // and every |q| is within the int8 symmetric range
    assert(q.filter(abs(col("q")) > 127).count() == 0)
  }
}
