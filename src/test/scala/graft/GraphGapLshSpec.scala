package graft

import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, GapFill}
import graft.vector.Similarity

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("components of a hand-built graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 7L))
      .toDF("src", "dst")
    val got = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)))
  }

  test("long chain converges (log-round contraction, not diameter)") {
    val n = 64
    val edges = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges, maxIter = 10)
      .as[(Long, Long)].collect().toSet
    assert(got == (1 to n).map(i => (i.toLong, 1L)).toSet)
  }

  test("matches union-find on the sf0.001 order-part graph") {
    val edges = Tables.lineitem(spark, sfDir)
      .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap

    // reference union-find on the collected edge list (test-only)
    val es = edges.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val exp = parent.keys.map(x => x -> find(x)).toMap
    assert(got.size == exp.size)
    // same partition: components must be identical as min-labelled sets
    assert(got == exp.map { case (n, _) => n -> exp.filter(_._2 == exp(n)).keys.min }
      .map(identity))
  }
}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("lastPrior attaches the most recent right row per key") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 15L))
      .toDF("k", "ord")
    val right = Seq((1L, 12L, "a"), (1L, 25L, "b"), (3L, 1L, "z"))
      .toDF("k", "ord", "v")
    val got = operators.AsOfJoin.lastPrior(left, right, "k", "ord", Seq("v" -> "v"))
      .select("k", "ord", "v").as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set((1L, 10L, None), (1L, 20L, Some("a")),
      (1L, 30L, Some("b")), (2L, 15L, None)))
  }

  test("equal ord matches (right sorts before left)") {
    val left = Seq((1L, 10L)).toDF("k", "ord")
    val right = Seq((1L, 10L, "x")).toDF("k", "ord", "v")
    val got = operators.AsOfJoin.lastPrior(left, right, "k", "ord", Seq("v" -> "v"))
      .select("v").as[Option[String]].head()
    assert(got.contains("x"))
  }

  test("as-of join is a single shuffle") {
    val df = SparkEntry.queries("q_asof_join")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 shuffle, got $n")
  }
}

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("linear interpolation across a gap") {
    val df = Seq((1L, 10L, 2.0), (1L, 13L, 8.0), (1L, 14L, 4.0))
      .toDF("user_id", "frame_in", "value")
    val got = GapFill.linear(df, "user_id", col("frame_in"), col("value"))
      .select("frame", "v_fill", "is_observed")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (10L, 2.0, true), (11L, 4.0, false), (12L, 6.0, false),
      (13L, 8.0, true), (14L, 4.0, true)))
  }

  test("frames with multiple observations take the minimum") {
    val df = Seq((1L, 10L, 2.0), (1L, 10L, 4.0), (1L, 11L, 9.0))
      .toDF("user_id", "frame_in", "value")
    val got = GapFill.linear(df, "user_id", col("frame_in"), col("value"))
      .select("frame", "v_fill").as[(Long, Double)].collect().toMap
    assert(got == Map(10L -> 2.0, 11L -> 9.0))
  }
}

class CosineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted near-duplicate vectors are found; orthogonal ones are not") {
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val near = base.zipWithIndex.map { case (x, i) => x + (if (i == 0) 0.01f else 0.0f) }
    val ortho = Array.tabulate(64)(i => (if (i % 2 == 0) 1.0f else -1.0f) * math.cos(i).toFloat)
    val vecs = Seq((1L, base), (2L, near), (3L, ortho)).toDF("vec_id", "embedding")
    val got = graft.vector.Similarity.cosineDupPairs(vecs, 64, 0.99)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("no false positives on the real corpus at high threshold") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = graft.vector.Similarity.cosineDupPairs(emb, 64, 0.9).count()
    assert(n == 0) // max pairwise cosine in the corpus is ~0.51
  }
}

class LshAnnSpec extends SparkSpec {
  import spark.implicits._

  test("LSH top-k recall against brute force on sf0.001") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteTopK(emb, queries, 5)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._3)).toSet
    val approx = Similarity.lshTopK(emb, queries, 5, dim = 64)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._3)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low")
    info(s"recall@5 = $recall")
  }
}
