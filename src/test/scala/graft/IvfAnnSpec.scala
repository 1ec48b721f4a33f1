package graft

import org.apache.spark.sql.functions._
import graft.vector.{IvfAnn, Similarity}

class IvfAnnSpec extends SparkSpec {
  import spark.implicits._

  test("nprobe = nlist scans everything and equals brute force exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteTopK(emb, queries, 5)
      .as[(Long, Int, Long)].collect().toSet
    val full = IvfAnn.topK(emb, queries, 5, nlist = 8, nprobe = 8)
      .as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
  }

  test("IVF top-k recall against brute force on sf0.001") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteTopK(emb, queries, 5)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._3)).toSet
    val approx = IvfAnn.topK(emb, queries, 5, nlist = 16, nprobe = 8)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._3)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall too low")
    info(s"IVF recall@5 (nprobe=nlist/2) = $recall")
  }

  test("one trained quantizer serves two query batches identically") {
    val emb = Tables.embeddings(spark, sfDir)
    val (assigned, cents) = IvfAnn.quantize(emb, nlist = 8)
    val qa = emb.filter(col("vec_id") < 5)
    val qb = emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
    val a = IvfAnn.topKWith(assigned, cents, emb, qa, 5, nprobe = 8)
      .as[(Long, Int, Long)].collect().toSet
    val b = IvfAnn.topKWith(assigned, cents, emb, qb, 5, nprobe = 8)
      .as[(Long, Int, Long)].collect().toSet
    // nprobe = nlist on a shared quantizer == brute force per batch
    val exact = Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 10), 5)
      .as[(Long, Int, Long)].collect().toSet
    assert((a ++ b) == exact)
    assert(a.map(_._1).intersect(b.map(_._1)).isEmpty)
  }

  test("multi-probe LSH recall beats or matches single-probe") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteTopK(emb, queries, 5)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._3)).toSet
    def recall(probes: Int) = {
      val approx = Similarity.lshTopK(emb, queries, 5, dim = 64, probes = probes)
        .as[(Long, Int, Long)].collect().map(r => (r._1, r._3)).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val r0 = recall(0)
    val r3 = recall(3)
    assert(r3 >= r0, s"multi-probe recall $r3 below single-probe $r0")
    info(s"recall@5 probes=0: $r0, probes=3: $r3")
  }
}
