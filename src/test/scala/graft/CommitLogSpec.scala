package graft

import org.apache.spark.sql.functions._

import graft.text.{Bm25, Bm25Index}

/** The rewrite half of the commit journal (CommitLog.rewriting): a
  * maintenance pass that dies inside a partition overwrite's
  * delete-then-rename window — old files already gone, replacements
  * half-written — recovers to the pre-maintenance store byte-for-byte
  * from the undo backup, and a completed pass leaves no journal. */
class CommitLogSpec extends SparkSpec {
  import spark.implicits._

  private def fileCensus(dir: String): Set[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => (root.relativize(p).toString, java.nio.file.Files.size(p)))
      .filterNot(_._1.startsWith("_ledger"))
      .toSet
  }

  test("a kill inside a bucket overwrite is rolled back from the undo backup; " +
      "a completed compaction leaves no journal and serves identically") {
    val queries = Seq(1 -> "hash join", 2 -> "window agg")
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("commitlog").toString
    Bm25Index.build(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      col("doc_id"), col("text"), dir, nBuckets = 8)
    Bm25Index.append(docs.filter(pmod(col("doc_id"), lit(2)) === 1),
      col("doc_id"), col("text"), dir) // fragment the buckets
    def served() = Bm25Index.topK(spark, dir, queries)
      .as[(Int, Long, Long, Double, Int)].collect().toSet
    val want = served()
    val before = fileCensus(dir)

    // simulate the torn delete-then-rename window: inside a journaled
    // rewrite of bucket=0, its old files are deleted and a half-written
    // replacement appears, then the process dies
    val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val b0 = new org.apache.hadoop.fs.Path(s"$dir/postings/bucket=0")
    intercept[RuntimeException] {
      graft.sources.CommitLog.rewriting(spark, dir,
        Seq("postings/bucket=0", "meta")) {
        hfs.listStatus(b0).foreach(f => hfs.delete(f.getPath, false))
        val half = hfs.create(
          new org.apache.hadoop.fs.Path(b0, "part-half.snappy.parquet"), true)
        half.write(Array[Byte](1, 2, 3)); half.close()
        throw new RuntimeException("simulated crash")
      }
    }
    assert(fileCensus(dir) != before, "the bucket must be torn")
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == before,
      "recover must restore the rewritten bucket byte-for-byte")
    assert(served() == want)

    // the real (journaled) compaction completes: serving identical,
    // postings folded, journal gone
    Bm25Index.compact(spark, dir)
    assert(served() == want)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$dir/_ledger/maint.pre")))
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$dir/_ledger/maint.undo")))
    // and recover on the clean compacted store is a no-op
    val compacted = fileCensus(dir)
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == compacted)
  }

test("a stale undo from a completed pass is never merged into a later " +
      "rewrite's backups, and recover drops orphaned undo dirs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orphan_undo").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val before = fileCensus(dir)

    // a COMPLETED earlier pass died between its two journal deletes:
    // maint.pre is gone but maint.undo survives, holding a
    // superseded-generation file the store no longer contains
    val staleUndo = new org.apache.hadoop.fs.Path(s"$dir/_ledger/maint.undo")
    hfs.mkdirs(staleUndo)
    val ghost = hfs.create(
      new org.apache.hadoop.fs.Path(staleUndo, "part-ghost.parquet"), true)
    ghost.write(Array[Byte](4, 4, 4)); ghost.close()

    // recover on its own must treat the orphan as garbage (its pass
    // committed) and drop it without touching the store
    graft.sources.CommitLog.recover(spark, dir)
    assert(!hfs.exists(staleUndo), "orphaned undo must be dropped")
    assert(fileCensus(dir) == before)

    // plant it AGAIN, then run a TORN rewrite: pre-fix the fresh
    // backups were merged into the stale undo dir and recovery
    // resurrected the ghost file alongside the restored parts
    hfs.mkdirs(staleUndo)
    val ghost2 = hfs.create(
      new org.apache.hadoop.fs.Path(staleUndo, "part-ghost.parquet"), true)
    ghost2.write(Array[Byte](4, 4, 4)); ghost2.close()
    val parts = hfs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.getName).toSeq
    intercept[RuntimeException] {
      graft.sources.CommitLog.rewriting(spark, dir, parts) {
        parts.foreach(f =>
          hfs.delete(new org.apache.hadoop.fs.Path(dir, f), false))
        throw new RuntimeException("simulated crash")
      }
    }
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == before,
      "recovery must restore exactly the pre-rewrite store — no ghost " +
        "file from the stale undo generation")
  }

test("staged displacement: a kill between the rename-away and the publish " +
      "restores the store byte-for-byte; a completed staged pass is clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("staged").toString
    (1 to 3).foreach(i => Seq((i.toLong, s"p$i")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(dir))
    val before = fileCensus(dir)
    val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parts = hfs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.getName).toSeq

    // the displacement window: originals already renamed into the
    // undo, publish dies before writing anything
    intercept[RuntimeException] {
      graft.sources.CommitLog.rewritingStaged(spark, dir, parts)(()) { _ =>
        throw new RuntimeException("simulated crash after displacement")
      }
    }
    // the data files are GONE from the store (renamed away, not copied)
    assert(fileCensus(dir) != before, "displacement must have moved files")
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == before,
      "recover must restore the displaced originals byte-for-byte")

    // half-published variant: publish wrote a partial replacement too
    intercept[RuntimeException] {
      graft.sources.CommitLog.rewritingStaged(spark, dir, parts)(()) { _ =>
        val half = hfs.create(new org.apache.hadoop.fs.Path(dir,
          "part-half.snappy.parquet"), true)
        half.write(Array[Byte](1, 2, 3)); half.close()
        throw new RuntimeException("simulated crash mid-publish")
      }
    }
    graft.sources.CommitLog.recover(spark, dir)
    assert(fileCensus(dir) == before)

    // a completed staged pass leaves no journal and the store serves
    graft.sources.CommitLog.rewritingStaged(spark, dir, parts)({
      spark.read.parquet(dir).collect().toSeq // staged snapshot
    }) { rows =>
      rows.map(r => (r.getLong(0), r.getString(1))).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$dir/_ledger/maint.pre")))
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$dir/_ledger/maint.undo")))
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet ===
      Set((1L, "p1"), (2L, "p2"), (3L, "p3")))
  }
}
