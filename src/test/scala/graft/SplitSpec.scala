package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.Split

class SplitSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("every document of a group lands in the same split") {
    val a = Split.byGroup(docs, col("doc_id"), col("source"))
    val perGroup = a.groupBy("grp")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1)
    assert(perGroup.count() == 0)
  }

  test("assignment is deterministic and map-only (no exchange)") {
    val a = Split.byGroup(docs, col("doc_id"), col("source")).collect()
      .map(_.toString).sorted.toSeq
    val b = Split.byGroup(docs, col("doc_id"), col("source")).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
    val plan = Split.byGroup(docs, col("doc_id"), col("source"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected map-only plan:\n$plan")
  }

  test("buckets map to splits by the declared thresholds") {
    val a = Split.byGroup(docs, col("doc_id"), col("source"),
      trainPct = 50, valPct = 25)
    val bad = a.filter(
      (col("bucket") < 50 && col("split") =!= "train") ||
        (col("bucket") >= 50 && col("bucket") < 75 && col("split") =!= "val") ||
        (col("bucket") >= 75 && col("split") =!= "test"))
    assert(bad.count() == 0)
    // synthetic-group split over many groups: every split non-empty
    val manyGroups = docs.withColumn("g", col("doc_id") % 97)
    val m = Split.byGroup(manyGroups, col("doc_id"), col("g").cast("string"))
    val bySplit = m.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "val", "test"), bySplit.toString)
  }

  test("leakage reports exactly the cross-split near-dup pairs") {
    val assign = Split.byGroup(docs, col("doc_id"), col("source"))
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
      3, 0.5, 1000L)
    val leaks = Split.leakage(assign, pairs)
    // replay: every reported pair straddles; every straddling pair reported
    val joined = pairs
      .join(assign.select(col("doc_id").as("d1"), col("split").as("s1")), Seq("d1"))
      .join(assign.select(col("doc_id").as("d2"), col("split").as("s2")), Seq("d2"))
    val straddling = joined.filter(col("s1") =!= col("s2")).count()
    assert(leaks.count() == straddling)
    assert(leaks.filter(col("split_1") === col("split_2")).count() == 0)
  }
}
