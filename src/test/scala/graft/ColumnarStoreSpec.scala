package graft

import org.apache.spark.sql.functions._

import graft.sources.ColumnarStore

/** Format-parametric release store: parquet/ORC round-trip parity,
  * predicate pushdown and partition pruning in BOTH formats, and
  * statistics-only aggregation on the V2 read path. */
class ColumnarStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .select("doc_id", "text", "lang", "source")

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("round-trip parity between parquet and orc") {
    val base = "/tmp/graft_store_parity"
    ColumnarStore.write(docs, s"$base/p", "parquet", None)
    ColumnarStore.write(docs, s"$base/o", "orc", None)
    val p = ColumnarStore.read(spark, s"$base/p", "parquet")
      .orderBy("doc_id").collect()
    val o = ColumnarStore.read(spark, s"$base/o", "orc")
      .orderBy("doc_id").collect()
    assert(p.length == docs.count() && p.toSeq == o.toSeq)
  }

  test("predicate pushdown reaches both formats' readers") {
    val base = "/tmp/graft_store_pushdown"
    for (fmt <- Seq("parquet", "orc")) {
      ColumnarStore.write(docs, s"$base/$fmt", fmt, None)
      val plan = planOf(ColumnarStore.read(spark, s"$base/$fmt", fmt)
        .filter(col("doc_id") > 100L).select("doc_id"))
      assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(doc_id"),
        s"$fmt plan lacks pushed filter:\n$plan")
      // column pruning: the scan reads only doc_id
      assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
        s"$fmt plan reads more than doc_id:\n$plan")
    }
  }

  test("partition pruning in both formats") {
    val base = "/tmp/graft_store_prune"
    for (fmt <- Seq("parquet", "orc")) {
      ColumnarStore.write(docs, s"$base/$fmt", fmt, Some("lang"))
      val df = ColumnarStore.read(spark, s"$base/$fmt", fmt)
        .filter(col("lang") === "en")
      val plan = planOf(df)
      assert(plan.contains("PartitionFilters: [isnotnull(lang"),
        s"$fmt plan lacks partition filter:\n$plan")
      // values survive the round trip under pruning
      assert(df.count() == docs.filter(col("lang") === "en").count())
    }
  }

  test("statistics-only aggregation on the V2 read path") {
    val base = "/tmp/graft_store_agg"
    for (fmt <- Seq("parquet", "orc")) {
      ColumnarStore.write(docs, s"$base/$fmt", fmt, None)
      ColumnarStore.withAggPushdown(spark, fmt) { loaned =>
        val agg = ColumnarStore.read(loaned, s"$base/$fmt", fmt)
          .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
        val row = agg.collect()(0)
        val plan = agg.queryExecution.executedPlan.toString
        assert(plan.contains("PushedAggregation") && plan.contains("MIN(doc_id)")
            && plan.contains("MAX(doc_id)"),
          s"$fmt plan lacks pushed aggregation:\n$plan")
        // footer statistics agree with the data
        assert(row.getLong(0) == docs.count())
        assert(row.getLong(1) == docs.agg(min("doc_id")).collect()(0).getLong(0))
        assert(row.getLong(2) == docs.agg(max("doc_id")).collect()(0).getLong(0))
      }
    }
    // outside the loan the session is back on the V1 path
    assert(spark.conf.get("spark.sql.sources.useV1SourceList").contains("parquet"))
  }
}
