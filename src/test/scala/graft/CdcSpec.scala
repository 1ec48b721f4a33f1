package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Cdc, CdcChunk}

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(payloads: (Long, Array[Byte])*): Map[Long, Seq[CdcChunk]] =
    Cdc.chunks(spark, payloads.toDF("doc_id", "payload"))
      .collect().toSeq.groupBy(_.doc_id)
      .view.mapValues(_.sortBy(_.chunk_idx)).toMap

  private def noise(n: Int, seed: Long): Array[Byte] =
    Array.tabulate(n)(i =>
      (graft.functions.Mix64.compute(seed * 1000003L + i) & 0xff).toByte)

  test("chunks partition the payload exactly with size bounds respected") {
    val b = noise(5000, 1L)
    val cs = chunksOf(1L -> b)(1L)
    assert(cs.head.offset == 0)
    assert(cs.map(_.len).sum == 5000)
    cs.sliding(2).foreach {
      case Seq(a, c) => assert(c.offset == a.offset + a.len)
      case _ =>
    }
    // every chunk except possibly the last is within [min, max]
    cs.init.foreach(c => assert(c.len >= 16 && c.len <= 256, c.toString))
    assert(cs.last.len <= 256)
    // avgBits=6 -> expected ~64-byte chunks; sanity on the count
    assert(cs.size > 20 && cs.size < 200, s"${cs.size} chunks")
  }

  test("shift robustness: a prepended byte changes only a bounded prefix of chunk hashes") {
    val b = noise(5000, 2L)
    val shifted = Array((0x42).toByte) ++ b
    val orig = chunksOf(1L -> b)(1L).map(_.chunk_hash)
    val shif = chunksOf(1L -> shifted)(1L).map(_.chunk_hash)
    // boundaries resynchronize: the TAIL chunk sequences coincide
    val common = orig.reverse.zip(shif.reverse).takeWhile { case (x, y) => x == y }.length
    assert(common >= orig.size - 3,
      s"only $common of ${orig.size} tail chunks survived a 1-byte shift")
    // fixed-size chunking, by contrast, would share zero block hashes
    val fixedOrig = b.grouped(64).map(a => Cdc.fnv1a(a, 0, a.length)).toSet
    val fixedShift = shifted.grouped(64).map(a => Cdc.fnv1a(a, 0, a.length)).toSet
    assert(fixedOrig.intersect(fixedShift).size <= 2,
      "fixed-size baseline unexpectedly shift-tolerant")
  }

  test("sharedChunks surfaces embedded common content across assets") {
    val shared = noise(1000, 3L)
    val a = noise(400, 4L) ++ shared ++ noise(300, 5L)
    val bb = noise(700, 6L) ++ shared
    val c = noise(1200, 7L)
    val ds = Cdc.chunks(spark, Seq(1L -> a, 2L -> bb, 3L -> c).toDF("doc_id", "payload"))
    val rep = Cdc.sharedChunks(ds).collect()
    assert(rep.nonEmpty, "no shared chunks found for planted common block")
    assert(rep.forall(_.getAs[Long]("n_docs") >= 2L))
    // the planted block spans multiple chunks shared by docs 1 and 2 only
    val sharedHashes = rep.map(_.getAs[Long]("chunk_hash")).toSet
    val byDoc = ds.collect().groupBy(_.doc_id)
      .view.mapValues(_.map(_.chunk_hash).toSet).toMap
    assert(sharedHashes.subsetOf(byDoc(1L) union byDoc(2L)))
    assert(sharedHashes.intersect(byDoc(3L)).isEmpty,
      "unrelated asset matched a shared chunk")
    assert(sharedHashes.size >= 5, s"expected several shared chunks, got ${sharedHashes.size}")
  }

  test("determinism and empty payloads") {
    val b = noise(2000, 8L)
    val a1 = chunksOf(1L -> b)(1L)
    val a2 = chunksOf(1L -> b)(1L)
    assert(a1 == a2)
    assert(chunksOf(9L -> Array.emptyByteArray).getOrElse(9L, Nil).isEmpty)
  }
}
