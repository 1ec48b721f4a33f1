package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** MVCC-lite snapshot isolation: a reader resolved at generation N
  * keeps reading N's exact file set across concurrent compactions and
  * appends; a publication is atomic (old complete or new complete,
  * never a mix); retirement reclaims superseded parts only past the
  * grace window. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("id").cast("long"), col("s")).as[(Long, String)].collect().toSet

  test("snapshot isolation: an in-flight reader survives compaction and " +
      "retirement inside the grace window; publication is never a mix") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore").toString
    val all = (1L to 30L).map(i => (i, s"v$i"))
    all.grouped(10).foreach(b => SnapshotStore.append(b.toDF("id", "s"), dir))
    assert(SnapshotStore.currentGen(spark, dir) === 3L)
    val want = all.toSet
    assert(rows(SnapshotStore.read(spark, dir)) === want)

    // resolve a reader NOW (generation 3, three part files), then
    // compact: the reader's plan is pinned to the old files and must
    // still serve after the new generation publishes
    val oldReader = SnapshotStore.read(spark, dir)
    SnapshotStore.compact(spark, dir)
    assert(SnapshotStore.currentGen(spark, dir) === 4L)
    assert(rows(SnapshotStore.read(spark, dir)) === want,
      "compaction must not change contents")
    assert(rows(oldReader) === want,
      "the in-flight reader must still see its snapshot")

    // retirement with the default 2-generation grace keeps gen 3's
    // parts alive for the old reader...
    SnapshotStore.retire(spark, dir, keepGenerations = 2)
    assert(rows(oldReader) === want,
      "grace-window retirement must not break the in-flight reader")
    // ...and a tight window reclaims them (the reader's lease is the
    // caller's grace-sizing contract)
    SnapshotStore.retire(spark, dir, keepGenerations = 1)
    assert(rows(SnapshotStore.read(spark, dir)) === want)
    val partDirs = new java.io.File(dir, "parts").listFiles().toSeq
    assert(partDirs.length === 1,
      s"superseded parts must be reclaimed; got ${partDirs.map(_.getName)}")

    // appends after compaction keep composing
    SnapshotStore.append(Seq((31L, "v31")).toDF("id", "s"), dir)
    assert(rows(SnapshotStore.read(spark, dir)) === want + ((31L, "v31")))
  }

  test("a torn compaction is invisible: unpublished parts never reach a " +
      "reader and retirement sweeps them") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_torn").toString
    val all = (1L to 20L).map(i => (i, s"v$i"))
    all.grouped(10).foreach(b => SnapshotStore.append(b.toDF("id", "s"), dir))
    val want = all.toSet
    val genBefore = SnapshotStore.currentGen(spark, dir)

    // simulate a compactor killed AFTER writing its folded part but
    // BEFORE publishing CURRENT: write an orphan part dir directly
    val orphan = new java.io.File(dir, "parts/c_torn")
    orphan.mkdirs()
    Seq((999L, "ghost")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(orphan.toString)
    assert(SnapshotStore.currentGen(spark, dir) === genBefore,
      "an unpublished part must not advance the generation")
    assert(rows(SnapshotStore.read(spark, dir)) === want,
      "readers resolve the old manifest exactly — never a mix")

    // the retrying compactor succeeds alongside the debris, and
    // retirement sweeps the orphan with the superseded parts
    SnapshotStore.compact(spark, dir)
    assert(rows(SnapshotStore.read(spark, dir)) === want)
    SnapshotStore.retire(spark, dir, keepGenerations = 1)
    assert(!orphan.exists(), "orphaned torn parts must be swept")
    assert(rows(SnapshotStore.read(spark, dir)) === want)
  }

  test("an absent CURRENT resolves the newest manifest, not an empty " +
      "store (rename-refuses-to-replace filesystems delete CURRENT on " +
      "every publish)") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_nocur").toString
    val all = (1L to 20L).map(i => (i, s"v$i"))
    all.grouped(10).foreach(b => SnapshotStore.append(b.toDF("id", "s"), dir))
    val want = all.toSet
    // simulate the publish window (or a crash inside it) on a
    // filesystem whose rename cannot replace: CURRENT is deleted, both
    // rename-published manifests remain
    assert(new java.io.File(dir, "_ledger/CURRENT").delete())
    assert(SnapshotStore.currentGen(spark, dir) === 2L,
      "readers must fall back to the newest manifest")
    assert(rows(SnapshotStore.read(spark, dir)) === want,
      "a mid-publish reader serves the newest complete generation")
    // the store recovers fully: the next append restores CURRENT
    SnapshotStore.append(Seq((21L, "v21")).toDF("id", "s"), dir)
    assert(SnapshotStore.currentGen(spark, dir) === 3L)
    assert(rows(SnapshotStore.read(spark, dir)) === want + ((21L, "v21")))
    assert(new java.io.File(dir, "_ledger/CURRENT").exists())
  }

  test("manifest-list indirection: an append reuses every prior " +
      "manifest part by reference and writes exactly one new one — " +
      "publish cost O(delta), not O(live files)") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_mlist").toString
    def ledgerNames(prefix: String): Seq[String] =
      new java.io.File(dir, "_ledger").listFiles().toSeq
        .map(_.getName).filter(_.startsWith(prefix)).sorted
    def manifestRefs(gen: Long): Seq[String] =
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "_ledger", s"manifest.$gen"))
        .linesIterator.filter(_.startsWith("@")).map(_.drop(1)).toSeq
    SnapshotStore.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    val gen1Parts = manifestRefs(1L)
    assert(gen1Parts.length === 1, "one append = one manifest part")
    SnapshotStore.append((6L to 9L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    val gen2Parts = manifestRefs(2L)
    assert(gen2Parts.length === 2)
    assert(gen2Parts.contains(gen1Parts.head),
      "the untouched prior part must be REUSED by reference, not rewritten")
    assert(ledgerNames("mp_").length === 2,
      "no extra manifest parts beyond the two appends'")
    assert(rows(SnapshotStore.read(spark, dir))
      === (1L to 9L).map(i => (i, s"v$i")).toSet)
    // a full fold stops referencing the old parts; retirement then
    // drops the unreferenced manifest parts with their manifests
    SnapshotStore.compact(spark, dir)
    assert(manifestRefs(3L).toSet.intersect(gen2Parts.toSet).isEmpty)
    SnapshotStore.retire(spark, dir, keepGenerations = 1)
    assert(ledgerNames("mp_") === manifestRefs(3L),
      "manifest parts unreferenced by the kept window must be swept")
  }

  test("writer fencing: a stale writer's publish throws instead of " +
      "silently dropping the newer writer's lines") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_fence").toString
    SnapshotStore.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    // writer A claims the store and resolves its view...
    val fenceA = SnapshotStore.acquireFence(spark, dir)
    val viewA = SnapshotStore.currentFiles(spark, dir)
    // ...then writer B claims AFTER A and publishes first (B's fence
    // is newest at B's publish, so B proceeds)
    val fenceB = SnapshotStore.acquireFence(spark, dir)
    val relB = "parts/b_fence_b"
    Seq((100L, "b")).toDF("id", "s").coalesce(1)
      .write.parquet(s"$dir/$relB")
    SnapshotStore.publishNext(spark, dir,
      SnapshotStore.currentFiles(spark, dir) ++
        SnapshotStore.partFiles(spark, dir, relB), fenceB)
    assert(rows(SnapshotStore.read(spark, dir))
      === (1L to 5L).map(i => (i, s"v$i")).toSet + ((100L, "b")))
    // A's publish was computed from a pre-B read: it MUST fail fast —
    // publishing viewA would drop B's row
    val relA = "parts/b_fence_a"
    Seq((200L, "a")).toDF("id", "s").coalesce(1)
      .write.parquet(s"$dir/$relA")
    val e = intercept[IllegalStateException] {
      SnapshotStore.publishNext(spark, dir,
        viewA ++ SnapshotStore.partFiles(spark, dir, relA), fenceA)
    }
    assert(e.getMessage.contains("stale writer"))
    // the store still serves B's generation, lines intact
    assert(rows(SnapshotStore.read(spark, dir))
      === (1L to 5L).map(i => (i, s"v$i")).toSet + ((100L, "b")))
  }

  test("AS-OF generation reads: a pinned pre-compaction generation " +
      "equals the pre-compaction store until retired") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_asof").toString
    SnapshotStore.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    SnapshotStore.append((6L to 8L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    val want = (1L to 8L).map(i => (i, s"v$i")).toSet
    SnapshotStore.compact(spark, dir)
    assert(SnapshotStore.generations(spark, dir) === Seq(1L, 2L, 3L))
    // read AS OF N-1 after the compaction == the pre-compaction store
    assert(rows(SnapshotStore.read(spark, dir, 2L)) === want)
    assert(rows(SnapshotStore.read(spark, dir, 1L))
      === (1L to 5L).map(i => (i, s"v$i")).toSet)
    assert(rows(SnapshotStore.read(spark, dir, 3L)) === want)
    // past the grace window the generation is gone (manifest retired)
    SnapshotStore.retire(spark, dir, keepGenerations = 1)
    assert(SnapshotStore.generations(spark, dir) === Seq(3L))
    intercept[Exception] { SnapshotStore.read(spark, dir, 1L).collect() }
    assert(rows(SnapshotStore.read(spark, dir, 3L)) === want)
  }

  test("optimistic append retry: two concurrent appenders both land " +
      "and the store equals the sequential result") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_cc").toString
    SnapshotStore.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    // race N appenders; appends commute, so every lost fence duel must
    // retry against the new CURRENT instead of throwing or dropping
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (0 until 4).map { t =>
      new Thread(() => {
        try SnapshotStore.append(
          Seq((100L + t, s"w$t")).toDF("id", "s"), dir)
        catch { case e: Throwable => errs.add(e); () }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"concurrent appends must all land: ${errs.peek()}")
    assert(SnapshotStore.currentGen(spark, dir) === 5L,
      "each append must publish its own generation")
    assert(rows(SnapshotStore.read(spark, dir))
      === (1L to 5L).map(i => (i, s"v$i")).toSet ++
        (0 until 4).map(t => (100L + t, s"w$t")))
  }

  test("multi-file parts round-trip through read, compact, and retire") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_mf").toString
    val all = (1L to 40L).map(i => (i, s"v$i"))
    SnapshotStore.append(all.toDF("id", "s"), dir, numFiles = 3)
    assert(SnapshotStore.read(spark, dir).inputFiles.length === 3,
      "numFiles must size the part")
    assert(rows(SnapshotStore.read(spark, dir)) === all.toSet)
    SnapshotStore.append(Seq((41L, "v41")).toDF("id", "s"), dir)
    assert(rows(SnapshotStore.read(spark, dir)) === all.toSet + ((41L, "v41")))
    SnapshotStore.compact(spark, dir, numFiles = 2)
    assert(SnapshotStore.read(spark, dir).inputFiles.length === 2)
    assert(rows(SnapshotStore.read(spark, dir)) === all.toSet + ((41L, "v41")))
    SnapshotStore.retire(spark, dir, keepGenerations = 1)
    assert(rows(SnapshotStore.read(spark, dir)) === all.toSet + ((41L, "v41")))
  }

  test("generation metadata: each publish stamps (op, fence, parent); " +
      "a compaction's meta names its parent; retirement drops metas " +
      "with their manifests") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_meta").toString
    SnapshotStore.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    SnapshotStore.append((6L to 9L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    SnapshotStore.compact(spark, dir)
    def metaOf(g: Long): Map[String, String] =
      SnapshotStore.generationMeta(spark, dir, g).get
        .split("\\s+").map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
    assert(metaOf(1L)("op") === "append")
    assert(metaOf(1L)("parent") === "0")
    assert(metaOf(2L)("op") === "append")
    assert(metaOf(3L)("op") === "compact")
    assert(metaOf(3L)("parent") === "2",
      "a compaction's meta must name the generation it folded")
    assert(metaOf(3L)("fence").toLong > metaOf(2L)("fence").toLong,
      "fences are claimed in operation order")
    SnapshotStore.retire(spark, dir, keepGenerations = 1)
    assert(SnapshotStore.generationMeta(spark, dir, 1L).isEmpty,
      "retired generations drop their meta stamps")
    assert(SnapshotStore.generationMeta(spark, dir, 3L).isDefined)
  }

  test("torn manifests above CURRENT are not a time-travel surface: " +
      "generations() excludes them and AS-OF reads refuse them") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_torn2").toString
    SnapshotStore.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    // a writer's manifest.2 whose CURRENT swap never ran: a later retry
    // of generation 2 delete-and-replaces it, so an AS-OF reader pinned
    // to it could have its manifest swapped underneath — refuse to pin
    val m = new java.io.File(dir, "_ledger/manifest.2")
    java.nio.file.Files.write(m.toPath, "parts/b_torn/x.parquet".getBytes)
    assert(SnapshotStore.generations(spark, dir) === Seq(1L),
      "an uncommitted manifest is not a generation")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.read(spark, dir, 2L)
    }
    assert(e.getMessage.contains("never committed"))
    // the torn slot is still recoverable: the next append commits a
    // REAL generation 2 over it
    SnapshotStore.append(Seq((6L, "v6")).toDF("id", "s"), dir)
    assert(SnapshotStore.generations(spark, dir) === Seq(1L, 2L))
    assert(rows(SnapshotStore.read(spark, dir, 2L))
      === (1L to 6L).map(i => (i, s"v$i")).toSet)
  }

  test("ledger sweep: streaming batch markers below the newest are " +
      "reclaimed (the committed-max probe covers them) and aged tmp " +
      "debris is dropped; the newest marker and live epoch survive") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_sweep").toString
    SnapshotStore.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    val ledger = new java.io.File(dir, "_ledger")
    Seq(0L, 1L, 2L, 7L).foreach(i =>
      java.nio.file.Files.write(
        new java.io.File(ledger, s"batch.$i").toPath, Array.empty[Byte]))
    val freshTmp = new java.io.File(ledger, "manifest.9.tmp")
    java.nio.file.Files.write(freshTmp.toPath, "x".getBytes)
    val agedTmp = new java.io.File(ledger, "mp_dead.tmp")
    java.nio.file.Files.write(agedTmp.toPath, "x".getBytes)
    assert(agedTmp.setLastModified(
      System.currentTimeMillis() - 2 * SnapshotStore.TmpGraceMs))
    SnapshotStore.retire(spark, dir, keepGenerations = 1)
    val names = ledger.listFiles().map(_.getName).toSet
    assert(!names.exists(n => n.startsWith("batch.") && n != "batch.7"),
      s"markers below the newest must be swept: $names")
    assert(names.contains("batch.7"), "the newest marker must survive")
    assert(!names.contains("mp_dead.tmp"), "aged tmp debris must be swept")
    assert(names.contains("manifest.9.tmp"),
      "a LIVE writer's in-flight tmp must survive the grace window")
    assert(names.exists(_.startsWith("fence.")), "the live epoch survives")
  }

  test("a reader resolved between manifest write and CURRENT swap sees " +
      "exactly the old generation") {
    val dir = java.nio.file.Files.createTempDirectory("snapstore_mid").toString
    SnapshotStore.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    val want = rows(SnapshotStore.read(spark, dir))
    // plant the NEXT generation's manifest without swapping CURRENT
    // (the window between the publish's two writes): readers key on
    // CURRENT alone, so they still resolve the committed set
    val m = new java.io.File(dir, "_ledger/manifest.99")
    java.nio.file.Files.write(m.toPath, "parts/b_nonexistent/x.parquet".getBytes)
    assert(rows(SnapshotStore.read(spark, dir)) === want)
    assert(SnapshotStore.currentGen(spark, dir) === 1L)
  }
}
