package graft

import org.apache.spark.sql.functions._
import graft.text.Manifest

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, 0L, "aa bb", 17L), (2L, 0L, "cc", 40L),
    (3L, 1L, "dd ee ff", 5L)).toDF("id", "shard", "text", "fp")

  test("hand-computed manifest: counts, token mass, xor checksum") {
    val m = Manifest.shardManifest(docs, col("shard"),
        size(split(col("text"), "\\s+")), col("fp"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m(0L) == ((2L, 3L, 17L ^ 40L)))
    assert(m(1L) == ((1L, 3L, 5L)))
  }

  test("checksum is order- and partitioning-independent; any single corruption flips it") {
    val big = spark.range(0, 1000).select(col("id"),
      (col("id") % 4).as("shard"), lit(1L).as("tok"),
      graft.functions.Mix64(col("id")).as("fp"))
    def sums(df: org.apache.spark.sql.DataFrame) =
      Manifest.shardManifest(df, col("shard"), col("tok"), col("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val a = sums(big)
    val b = sums(big.repartition(7, col("id")).sortWithinPartitions(col("fp").desc))
    assert(a == b, "checksum changed with physical layout")
    // corrupt one row's fingerprint: its shard's checksum must flip
    val corrupted = big.withColumn("fp",
      when(col("id") === 123L, col("fp") + 1L).otherwise(col("fp")))
    val c = sums(corrupted)
    assert(c(123L % 4) != a(123L % 4) && (a - (123L % 4)) == (c - (123L % 4)))
    // drop one row: flips too
    val d = sums(big.filter(col("id") =!= 77L))
    assert(d(77L % 4) != a(77L % 4))
  }
}
