package graft

import graft.text.Sharding
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-balanced shard assignment: full-sort parity, width/partition
  * invariance, the round-robin balance bound, and tie handling. */
class ShardingSpec extends SparkSpec {

  private def docs = Tables.load(spark, sfDir, "documents")
    .withColumn("_tc", graft.functions.TokenCounts(col("text")))
    .select(col("doc_id"), col("_tc.n_ws_tokens").as("n_tokens"))

  /** The semantics in one naive single-task window (test-only). */
  private def naive(nShards: Int) = docs
    .withColumn("shard",
      ((row_number().over(Window.orderBy(col("n_tokens").desc, col("doc_id")))
        - 1) % nShards).cast("long"))
    .select("doc_id", "n_tokens", "shard")

  test("parity with the naive full-sort window across shard counts") {
    for (n <- Seq(1, 4, 7)) {
      val got = Sharding.assignShards(docs, col("doc_id"), col("n_tokens"), n)
      assert(got.exceptAll(naive(n)).isEmpty && naive(n).exceptAll(got).isEmpty,
        s"mismatch at nShards=$n")
    }
  }

  test("invariant to scan width and input partitioning") {
    val a = Sharding.assignShards(docs, col("doc_id"), col("n_tokens"), 8, width = 3)
    val b = Sharding.assignShards(docs.repartition(13), col("doc_id"),
      col("n_tokens"), 8, width = 16)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("any two shard token totals differ by at most the largest document") {
    val assign = Sharding.assignShards(docs, col("doc_id"), col("n_tokens"), 8)
    val stats = Sharding.shardStats(assign)
      .agg(max("shard_tokens").as("mx"), min("shard_tokens").as("mn")).head()
    val largest = docs.agg(max("n_tokens")).head().getInt(0)
    assert(stats.getLong(0) - stats.getLong(1) <= largest.toLong)
  }

  test("ties broken by doc_id; hand-computed round-robin") {
    import spark.implicits._
    // sizes (10,9,8,7,7,5) with the two 7s on ids 40 < 41
    val tiny = Seq((1L, 10L), (2L, 9L), (3L, 8L), (40L, 7L), (41L, 7L), (6L, 5L))
      .toDF("doc_id", "n_tokens")
    val got = Sharding.assignShards(tiny, col("doc_id"), col("n_tokens"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 40L -> 1L, 41L -> 0L, 6L -> 1L))
  }

  test("more shards than documents: one document each, high shards empty") {
    import spark.implicits._
    val tiny = Seq((1L, 4L), (2L, 9L)).toDF("doc_id", "n_tokens")
    val got = Sharding.assignShards(tiny, col("doc_id"), col("n_tokens"), 5)
    assert(got.select("shard").as[Long].collect().sorted.toSeq == Seq(0L, 1L))
    assert(Sharding.shardStats(got).count() == 2)
  }
}
