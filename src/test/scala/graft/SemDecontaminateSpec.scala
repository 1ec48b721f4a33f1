package graft

import org.apache.spark.sql.functions._

import graft.vector.SemDecontaminate

class SemDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def run(corpus: Seq[(Long, Array[Float])],
                  eval: Seq[(Long, Array[Float])], threshold: Double) =
    SemDecontaminate.flag(
        corpus.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"),
        eval.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"),
        threshold)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap

  test("a verbatim-embedded eval item flags its corpus twin") {
    val corpus = Seq(
      1L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f), 3L -> Array(0f, 0f, 1f))
    val eval = Seq(10L -> Array(1f, 0f, 0f))
    val got = run(corpus, eval, threshold = 0.95)
    assert(got(1L) == ((10L, 1.0, 1)))
    // orthogonal docs report their (only) best match, unflagged
    assert(got(2L) == ((10L, 0.0, 0)))
    assert(got(3L) == ((10L, 0.0, 0)))
    assert(got.size == corpus.size) // one row per corpus vector
  }

  test("a paraphrase-like near match flags below verbatim") {
    val corpus = Seq(1L -> Array(3f, 4f, 0f))
    val eval = Seq(10L -> Array(3f, 4f, 1f), 11L -> Array(0f, 0f, 1f))
    val got = run(corpus, eval, threshold = 0.9)
    val (eid, sim, fl) = got(1L)
    assert(eid == 10L && fl == 1)
    assert(sim > 0.9 && sim < 1.0) // close but not verbatim
  }

  test("ties at the max match the smallest eval id") {
    val corpus = Seq(1L -> Array(1f, 0f))
    val eval = Seq(200L -> Array(2f, 0f), 100L -> Array(5f, 0f))
    val got = run(corpus, eval, threshold = 0.5)
    assert(got(1L) == ((100L, 1.0, 1)))
  }

  test("zero-norm vectors score a defined 0 instead of NaN/NULL") {
    val corpus = Seq(1L -> Array(1f, 0f), 2L -> Array(0f, 0f))
    val eval = Seq(10L -> Array(0f, 0f), 11L -> Array(1f, 0f))
    val got = run(corpus, eval, threshold = 0.5)
    // the zero EVAL vector must not win any argmax (Spark's raw 0/0
    // NaN would); the zero CORPUS vector reports sim 0, unflagged
    assert(got(1L) == ((11L, 1.0, 1)))
    assert(got(2L) == ((10L, 0.0, 0))) // tie at 0 -> smallest eval id
  }

  test("an empty eval set fails fast") {
    val ex = intercept[IllegalArgumentException] {
      run(Seq(1L -> Array(1f, 0f)), Seq.empty, threshold = 0.5)
    }
    assert(ex.getMessage.contains("empty eval set"))
  }

  test("q_sdecon runs end-to-end with one row per corpus vector") {
    val out = SparkEntry.queries("q_sdecon")(spark, sfDir).collect()
    val emb = Tables.load(spark, sfDir, "embeddings")
    val nCorpus = emb.filter(col("vec_id") % 17 =!= 0).count()
    assert(out.length == nCorpus)
    out.foreach { r =>
      assert(r.getLong(1) % 17 == 0, "matched id must be an eval item")
      assert(r.getDouble(2) <= 1.0 + 1e-9)
    }
  }
}
