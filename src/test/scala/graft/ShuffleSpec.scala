package graft

import org.apache.spark.sql.functions._
import graft.text.Shuffle

class ShuffleSpec extends SparkSpec {
  import spark.implicits._

  test("permute is a bijection onto (shard, pos) slots in key order") {
    val df = spark.range(0, 1000).select(col("id").as("doc_id"))
    val out = Shuffle.permute(df, col("doc_id"), nShards = 8).collect()
    assert(out.length == 1000)
    // slots unique and dense: shard*125 + pos covers 0..999 exactly
    val slots = out.map(r => r.getLong(2) * 125 + r.getLong(3)).sorted
    assert(slots.toSeq == (0L until 1000L))
    // slot order == (shuffle_key, doc_id) order
    val bydoc = out.sortBy(r => (r.getLong(1), r.getLong(0)))
      .map(r => r.getLong(2) * 125 + r.getLong(3))
    assert(bydoc.toSeq == (0L until 1000L))
  }

  test("shuffle_key matches the Lehmer closed form; layout is width-invariant and deterministic") {
    val df = spark.range(0, 500).select(col("id").as("doc_id"))
    val a = Shuffle.permute(df, col("doc_id"), 4, width = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val b = Shuffle.permute(df, col("doc_id"), 4, width = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(a == b, "layout changed with scan width")
    a.foreach { case (id, (k, _, _)) =>
      assert(k == graft.functions.Mix64.compute(id), s"doc $id key")
      assert(k >= 0L, s"doc $id key must be 63-bit non-negative")
    }
  }

  test("contiguous blocks: shard sizes are ceil(n/k) with only the last shard short") {
    val df = spark.range(0, 1003).select(col("id").as("doc_id"))
    val sizes = Shuffle.permute(df, col("doc_id"), 8)
      .groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ceil(1003/8) = 126; shards 0..6 full, shard 7 has 1003-7*126=121
    assert((0L to 6L).forall(sizes(_) == 126L) && sizes(7L) == 121L, sizes.toString)
  }

  test("layoutBy orders by an arbitrary key: curriculum easy-to-hard layout") {
    val df = spark.range(0, 100).select(col("id").as("doc_id"),
      (lit(1000L) - col("id") * 10L).as("difficulty"))
    val out = graft.text.Shuffle.layoutBy(df, col("doc_id"),
      col("difficulty"), nShards = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // difficulty DESCENDS with id, so slot order must REVERSE id order
    val slotByDoc = rows.map(r => r._1 -> (r._3 * 25 + r._4)).toMap
    (0L until 99L).foreach { i =>
      assert(slotByDoc(i) > slotByDoc(i + 1), s"doc $i vs ${i + 1}")
    }
    // shard 0 holds the 25 easiest (lowest difficulty = highest ids)
    val shard0 = rows.filter(_._3 == 0L).map(_._1).toSet
    assert(shard0 == (75L until 100L).toSet)
  }

  test("breaks id locality: consecutive doc_ids land in different shards") {
    val df = spark.range(0, 1000).select(col("id").as("doc_id"))
    val shardOf = Shuffle.permute(df, col("doc_id"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sameAsNext = (0L until 999L).count(i => shardOf(i) == shardOf(i + 1))
    // random assignment keeps ~1/8 of neighbours together; an unshuffled
    // block layout would keep ~992/999. Allow generous noise margin.
    assert(sameAsNext < 300, s"$sameAsNext of 999 neighbours share a shard")
  }
}
