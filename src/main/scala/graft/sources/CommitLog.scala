package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Atomic multi-directory batch commits for the multi-write artifact
  * stores (the BM25 index's postings + meta, the corpus-increment
  * artifact set) — the commit-log upgrade the ledger's declared
  * torn-batch caveat named: a micro-batch that touches SEVERAL
  * directories cannot be made idempotent by any single dynamic
  * overwrite, and a crash mid-apply used to leave a torn store whose
  * only remedy was restore-from-compaction-snapshot + replay.
  *
  * Model: a ROLLBACK JOURNAL at the batch grain (the SQLite/ARIES-undo
  * shape, which fits stores whose batches only ever ADD files):
  *
  *  1. `recover` — roll back any torn predecessor (see below);
  *  2. skip if this batch's COMMIT MARKER `_ledger/<id>` exists (the
  *     completed-batch replay gate, unchanged from the ledger);
  *  3. journal the store's PRE-STATE: one census file
  *     `_ledger/<id>.pre` listing every file and directory currently
  *     under the store (metadata-only listing, no data read; written
  *     to a temp name and RENAMED in, so a torn census can never be
  *     mistaken for a real one);
  *  4. run the batch's writes — which by store contract only CREATE
  *     files (parquet append parts, fresh `v=K` version directories),
  *     never delete or truncate existing ones;
  *  5. create the commit marker, then drop the journal.
  *
  * `recover` makes the whole sequence atomic to every later reader: a
  * journal without its commit marker identifies a torn batch, and
  * rolling back = deleting every file not in the census (the torn
  * batch's partial output, including any `_temporary` debris of a
  * killed write job) and every directory the batch introduced. A
  * journal WITH its marker is a crash between steps 5 and the cleanup
  * — already committed, so only the journal is dropped. Readers
  * therefore resolve committed file sets exactly, provided they attach
  * through `recover` (the single-writer stream wrapper does; ad-hoc
  * readers of a store that may have hosted a crash call it once
  * first). Crash points are the boundaries of individual write JOBS
  * (each parquet write commits or leaves `_temporary` debris — both
  * handled); within-file torn writes don't occur because parquet jobs
  * publish by rename.
  *
  * Scale shape: the census is driver-side file METADATA, cost
  * proportional to the store's file count — which compaction already
  * bounds (that is what the maintenance family is for) — and is paid
  * once per batch, the same class as the compaction census itself.
  * Undo cost is proportional to the torn batch, not the store.
  */
object CommitLog {

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify the root so census entries strip to genuinely RELATIVE
    // paths (listStatus returns scheme-qualified children; an
    // unqualified root would leave absolute URIs in the journal,
    // which survive only as long as the store never moves)
    (fs, fs.makeQualified(p))
  }

  private def ledgerDir(root: Path) = new Path(root, "_ledger")

  /** Relative paths of every file and directory under `root`, the
    * `_ledger` itself excluded; directories carry a trailing "/". */
  private def census(fs: FileSystem, root: Path): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    def rel(p: Path): String = p.toString.stripPrefix(root.toString)
      .stripPrefix("/")
    def walk(dir: Path): Unit = fs.listStatus(dir).foreach { s =>
      if (s.isDirectory) {
        if (s.getPath.getName != "_ledger") {
          out += rel(s.getPath) + "/"
          walk(s.getPath)
        }
      } else out += rel(s.getPath)
    }
    if (fs.exists(root)) walk(root)
    out.toSet
  }

  private def writeLines(fs: FileSystem, p: Path, lines: Seq[String]): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val o = fs.create(tmp, true)
    try o.write(lines.mkString("\n").getBytes("UTF-8")) finally o.close()
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"journal rename failed: $tmp -> $p")
  }

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** True if batch `batchId` committed against `storeDir`. */
  def committed(spark: SparkSession, storeDir: String, batchId: Long): Boolean = {
    val (fs, root) = fsOf(spark, storeDir)
    fs.exists(new Path(ledgerDir(root), batchId.toString))
  }

  private def copyRec(fs: FileSystem, src: Path, dst: Path): Unit = {
    val st = fs.getFileStatus(src)
    if (st.isDirectory) {
      fs.mkdirs(dst)
      fs.listStatus(src).foreach(c =>
        copyRec(fs, c.getPath, new Path(dst, c.getPath.getName)))
    } else {
      val in = fs.open(src)
      try {
        val out = fs.create(dst, true)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        finally out.close()
      } finally in.close()
    }
  }

  /** Roll back any torn commit under `storeDir` (no-op on a clean
    * store): for each journal without its commit marker, delete every
    * file not in the journaled census, every directory the torn
    * commit introduced (emptied bottom-up), then RESTORE any undo
    * backup ([[rewriting]]'s journal of files the work was allowed to
    * rewrite). Journals of committed batches, torn journal temp
    * files, and orphaned undo directories (their `.pre` already
    * consumed — a crash between a completed pass's two journal
    * deletes) are dropped. Idempotent. */
  def recover(spark: SparkSession, storeDir: String): Unit = {
    val (fs, root) = fsOf(spark, storeDir)
    val ld = ledgerDir(root)
    if (!fs.exists(ld)) return
    fs.listStatus(ld).foreach { s =>
      val name = s.getPath.getName
      if (name.endsWith(".pre.tmp")) { fs.delete(s.getPath, false); () }
      else if (name.endsWith(".pre")) {
        val id = name.stripSuffix(".pre")
        val undo = new Path(ld, s"$id.undo")
        if (fs.exists(new Path(ld, id))) {
          fs.delete(s.getPath, false)
          fs.delete(undo, true)
          ()
        } else {
          val pre = readLines(fs, s.getPath).toSet
          val now = census(fs, root)
          // extra files first, then extra dirs deepest-first so each
          // is empty (of journaled content) when its turn comes
          now.diff(pre).toSeq.filterNot(_.endsWith("/"))
            .foreach(f => fs.delete(new Path(root, f), false))
          now.diff(pre).toSeq.filter(_.endsWith("/"))
            .sortBy(-_.length)
            .foreach(d => fs.delete(new Path(root, d.dropRight(1)), true))
          // restore rewritten originals from the undo backup (files
          // the torn work deleted or replaced in place)
          if (fs.exists(undo)) {
            fs.listStatus(undo).foreach(c =>
              copyRec(fs, c.getPath, new Path(root, c.getPath.getName)))
            fs.delete(undo, true)
          }
          fs.delete(s.getPath, false)
          ()
        }
      }
    }
    // second pass: an undo dir whose .pre is gone belongs to a pass
    // that already COMPLETED (the crash fell between its two journal
    // deletes), so its backups are a superseded generation; a later
    // torn run must never restore them (they would resurrect
    // pre-compaction parts alongside the compacted file) — drop them
    fs.listStatus(ld).foreach { s =>
      val name = s.getPath.getName
      if (name.endsWith(".undo") &&
          !fs.exists(new Path(ld, name.stripSuffix(".undo") + ".pre"))) {
        fs.delete(s.getPath, true)
        ()
      }
    }
  }

  /** Apply `work` (the batch's multi-directory writes — which must
    * only ADD files) as one atomic, replay-skipped commit of batch
    * `batchId` against `storeDir`. */
  def atomically(spark: SparkSession, storeDir: String, batchId: Long)
                (work: => Unit): Unit = {
    recover(spark, storeDir)
    val (fs, root) = fsOf(spark, storeDir)
    val ld = ledgerDir(root)
    val marker = new Path(ld, batchId.toString)
    if (fs.exists(marker)) return
    fs.mkdirs(ld)
    val pre = new Path(ld, s"$batchId.pre")
    writeLines(fs, pre, census(fs, root).toSeq.sorted)
    work
    fs.create(marker, true).close()
    fs.delete(pre, false)
    ()
  }

  /** Apply `work` — a MAINTENANCE pass that may REWRITE files (the
    * compaction/retirement family: a dynamic partition overwrite's
    * job commit deletes a partition's old files before renaming the
    * new ones in, so a kill inside that window tears the partition) —
    * as one atomic, crash-recoverable operation. The store-relative
    * paths in `backup` name everything the work is allowed to rewrite
    * or delete; they are copied into the journal's undo directory
    * BEFORE the work runs, and a torn run is recovered by deleting
    * the work's partial output (the census diff) and restoring the
    * backups byte-for-byte. Undo cost is proportional to the data
    * being rewritten — which for compaction is the fragmented slice,
    * the same order as the rewrite itself.
    *
    * Unlike [[atomically]] there is no completion marker to skip
    * replays: maintenance is idempotent and re-runnable by contract
    * (single maintainer, between batches — the serialization the
    * appenders already assume), so completion simply drops the
    * journal. */
  def rewriting(spark: SparkSession, storeDir: String,
                backup: Seq[String])(work: => Unit): Unit = {
    recover(spark, storeDir)
    val (fs, root) = fsOf(spark, storeDir)
    val ld = ledgerDir(root)
    fs.mkdirs(ld)
    val pre = new Path(ld, "maint.pre")
    val undo = new Path(ld, "maint.undo")
    // a COMPLETED prior pass that died between its journal deletes
    // (pre gone, undo still here) leaves an orphaned undo dir recover
    // does not key on; merging fresh backups into those
    // superseded-generation files would let a later torn run restore
    // pre-compaction parts alongside the compacted file — clear it
    // before copying this pass's backups
    fs.delete(undo, true)
    writeLines(fs, pre, census(fs, root).toSeq.sorted)
    backup.foreach { rel =>
      val src = new Path(root, rel)
      if (fs.exists(src)) copyRec(fs, src, new Path(undo, rel))
    }
    work
    fs.delete(pre, false)
    fs.delete(undo, true)
    ()
  }

  /** The rename-displacing fast path of [[rewriting]]: `stage` runs
    * FIRST with the store intact and must fully MATERIALIZE everything
    * `publish` will write (a persisted RDD snapshot, a collected row —
    * nothing that still reads the displaced files); then every
    * `backup` path is RENAMED into the undo journal (a metadata
    * operation, where the copy-based journal paid a second full write
    * of the rewritten slice — at corpus scale that halves
    * compaction's write amplification); then `publish` writes the
    * replacements against the displaced store. Crash recovery is
    * [[recover]] unchanged: the undo directory holds the ORIGINALS
    * (complete by rename), so a kill during displacement, publish, or
    * cleanup restores the pre-maintenance store byte-for-byte exactly
    * as with copied backups. Same idempotent re-runnable contract as
    * [[rewriting]]. */
  def rewritingStaged[A](spark: SparkSession, storeDir: String,
                         backup: Seq[String])(stage: => A)
                        (publish: A => Unit): Unit = {
    recover(spark, storeDir)
    val (fs, root) = fsOf(spark, storeDir)
    val ld = ledgerDir(root)
    fs.mkdirs(ld)
    val pre = new Path(ld, "maint.pre")
    val undo = new Path(ld, "maint.undo")
    fs.delete(undo, true) // same stale-undo clearing as rewriting
    writeLines(fs, pre, census(fs, root).toSeq.sorted)
    val staged = stage
    backup.foreach { rel =>
      val src = new Path(root, rel)
      if (fs.exists(src)) {
        val dst = new Path(undo, rel)
        fs.mkdirs(dst.getParent)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"displace failed: $src -> $dst")
      }
    }
    publish(staged)
    fs.delete(pre, false)
    fs.delete(undo, true)
    ()
  }
}
