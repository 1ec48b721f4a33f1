package graft

import java.nio.file.{Files, Path, Paths}

import graft.sources.SnapshotStore

/** Pin for the store contract [[graft.sources.SnapshotStore]]'s doc
  * states (r18, the r17 advisor's finding): every write path is
  * strictly create-new or tmp+rename, so a HARD-LINK clone of a store
  * (the bench's copyTree) can be mutated — appends, compaction,
  * retirement — while the base tree stays byte-identical. A write
  * path that ever opened an existing file for overwrite would
  * truncate through the shared inode and fail this spec. */
class HardLinkCloneSpec extends SparkSpec {
  import spark.implicits._

  private def linkTree(src: Path, dst: Path): Unit = {
    if (Files.isDirectory(src)) {
      Files.createDirectories(dst)
      val s = Files.list(src)
      try s.forEach(c => linkTree(c, dst.resolve(c.getFileName.toString)))
      finally s.close()
    } else Files.createLink(dst, src)
  }

  /** (relative path, size, first bytes) of every file under `root` —
    * content fingerprint enough to catch truncation/overwrite. */
  private def snapshot(root: Path): Map[String, (Long, Seq[Byte])] = {
    val s = Files.walk(root)
    try s.filter(Files.isRegularFile(_)).toArray.toSeq.map {
      case p: Path =>
        val bytes = Files.readAllBytes(p)
        (root.relativize(p).toString,
          (bytes.length.toLong, bytes.take(64).toSeq))
    }.toMap
    finally s.close()
  }

  test("mutating a hard-link clone leaves the base tree byte-identical") {
    val base = Files.createTempDirectory("hlclone_base")
    (1L to 30L).map(i => (i, s"v$i")).grouped(10).foreach(b =>
      SnapshotStore.append(b.toSeq.toDF("id", "s"), base.toString))
    val before = snapshot(base)

    val work = Paths.get(base.toString + "_work")
    linkTree(base, work)
    // the full mutation lifecycle on the clone
    SnapshotStore.append(Seq((31L, "v31")).toDF("id", "s"), work.toString)
    SnapshotStore.compact(spark, work.toString)
    SnapshotStore.retire(spark, work.toString, keepGenerations = 1)

    assert(snapshot(base) === before,
      "mutating the hard-link clone changed the base tree")
    // and the clone diverged as expected while the base still serves
    assert(SnapshotStore.read(spark, work.toString).count() === 31L)
    assert(SnapshotStore.read(spark, base.toString).count() === 30L)
  }
}
