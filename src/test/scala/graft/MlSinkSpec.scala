package graft

import org.apache.spark.sql.functions._
import graft.ml.Models
import graft.sources.PartitionedSink

class MlSpec extends SparkSpec {
  import spark.implicits._

  test("logistic regression learns a learnable target") {
    // the synthetic `label` column is noise w.r.t. the embeddings, so a
    // derived, learnable target proves the training path: sign of the
    // first embedding component
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("label", (element_at(col("embedding"), 1) > 0.0f).cast("int"))
    val pred = Models.classifyEmbeddings(emb)
    val n = pred.count().toDouble
    val correct = pred.filter(col("label") === col("prediction")).count().toDouble
    info(f"accuracy ${correct / n}%.3f on ${n.toInt} test rows")
    assert(correct / n > 0.9, s"separable target should be learnable, got ${correct / n}")
  }

  test("kmeans clusters cover the corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    val clustered = Models.clusterEmbeddings(emb, k = 10)
    assert(clustered.count() == emb.count())
    val k = clustered.select("cluster").distinct().count()
    assert(k > 1 && k <= 10)
  }
}

class CompactionSpec extends SparkSpec {
  test("compaction rewrites many small files into the target count") {
    import graft.sources.Compaction
    val src = java.nio.file.Files.createTempDirectory("graft_small").toString
    // simulate fine-grained ingestion: 32 small files
    Tables.events(spark, sfDir).repartition(32).write
      .mode("overwrite").parquet(src)
    val dst = java.nio.file.Files.createTempDirectory("graft_compact").toString
    Compaction.compact(spark.read.parquet(src), dst, targetFiles = 2)
    val files = new java.io.File(dst).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 2, s"expected 2 files, got $files")
    assert(Compaction.read(spark, dst).count() == Tables.events(spark, sfDir).count())
  }
}

class PartitionedSinkSpec extends SparkSpec {
  test("partitioned write prunes partitions on filtered read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    PartitionedSink.write(Tables.events(spark, sfDir), dir, "event_type")
    val back = PartitionedSink.read(spark, dir).filter(col("event_type") === "click")
    back.collect()
    val plan = back.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("PartitionFilters: [") && plan.contains("event_type"),
      plan.take(800))
    val clicks = Tables.events(spark, sfDir).filter(col("event_type") === "click").count()
    assert(back.count() == clicks)
  }
}
