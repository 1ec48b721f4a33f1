package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** MVCC-lite versioned-manifest store — the reader-isolation upgrade
  * the rollback journal deliberately left out (single-writer
  * maintenance serializes WRITERS; a live READER overlapping a
  * compaction's delete-then-rename window could still observe a
  * partial store). Model: the snapshot-isolation half of an iceberg/
  * delta-style table, at the engine's parts-store grain:
  *
  *  - data lives in immutable part directories under `parts/` — a
  *    writer only ever CREATES new ones, never mutates or deletes a
  *    published file;
  *  - the committed file set is a MANIFEST: `_ledger/manifest.N`
  *    lists every live file (store-relative), and `_ledger/CURRENT`
  *    names N. Publication is one atomic rename of CURRENT — before
  *    it readers resolve generation N-1 complete, after it N
  *    complete, never a mix (the concurrent-reader spec's pin);
  *  - [[read]] resolves CURRENT once and plans over that exact file
  *    list, so a query keeps its snapshot for its whole lifetime even
  *    across concurrent appends/compactions (files it references
  *    outlive it — see retire);
  *  - [[compact]] folds the current generation into one new part and
  *    publishes the next manifest; superseded files are NOT deleted
  *    at publish time — [[retire]] deletes parts unreferenced by the
  *    last `keepGenerations` manifests, the grace window in-flight
  *    readers run inside (the same bargain iceberg's
  *    expire-snapshots strikes). A crash ANYWHERE leaves either the
  *    old CURRENT (unpublished parts are invisible orphans retire
  *    sweeps) or the new one (complete by construction) — no journal
  *    replay needed, which is why this store needs no CommitLog.
  *
  * Write amplification is unchanged vs the journaled stores (one new
  * part per append/compaction); the cost of isolation is deferred
  * space reclamation, bounded by the grace window. Single concurrent
  * WRITER by contract, readers unlimited.
  */
object SnapshotStore {

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(p))
  }

  private def ledger(root: Path) = new Path(root, "_ledger")
  private def currentPath(root: Path) = new Path(ledger(root), "CURRENT")

  private def writeAtomic(fs: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val o = fs.create(tmp, true)
    try o.write(content.getBytes("UTF-8")) finally o.close()
    if (!fs.rename(tmp, p)) {
      // rename-over-existing fails on some local FS implementations;
      // a delete+rename pair still leaves only {old absent, new
      // present} faces because the tmp write completed first
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"manifest rename failed: $tmp -> $p")
    }
    ()
  }

  private def readFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The current generation number, 0 when the store is empty.
    *
    * An ABSENT `CURRENT` does not mean an empty store: on HDFS and the
    * object-store filesystems `FileSystem.rename` refuses to replace
    * an existing destination, so [[writeAtomic]]'s delete-then-rename
    * pair is the NORMAL publication path there — every publish has a
    * window where CURRENT is missing (and a crash inside it loses
    * CURRENT until the next publish). Readers therefore fall back to
    * the newest `manifest.N` on disk: manifests are themselves
    * rename-published (a present manifest is complete), the newest one
    * is either the committed generation or the one whose CURRENT swap
    * was in flight — and in the latter case its part files were fully
    * written before `publish` ran, so resolving it early is safe. */
  def currentGen(spark: SparkSession, dir: String): Long = {
    val (fs, root) = fsOf(spark, dir)
    if (fs.exists(currentPath(root))) readFile(fs, currentPath(root)).trim.toLong
    else if (fs.exists(ledger(root)))
      fs.listStatus(ledger(root)).iterator
        .map(_.getPath.getName)
        .filter(_.startsWith("manifest."))
        .flatMap(_.stripPrefix("manifest.").toLongOption)
        .maxOption.getOrElse(0L)
    else 0L
  }

  /** Store-relative live files of generation `gen`. */
  private def manifestFiles(fs: FileSystem, root: Path, gen: Long): Seq[String] =
    if (gen == 0L) Nil
    else readFile(fs, new Path(ledger(root), s"manifest.$gen"))
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Data files (recursive, relative) under a freshly written part dir. */
  private def filesUnder(fs: FileSystem, root: Path, rel: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      if (s.isDirectory) walk(s.getPath)
      else if (!s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")) {
        out += s.getPath.toString.stripPrefix(root.toString).stripPrefix("/")
        ()
      }
    }
    walk(new Path(root, rel))
    out.toSeq
  }

  private def publish(fs: FileSystem, root: Path, gen: Long,
                      files: Seq[String]): Unit = {
    writeAtomic(fs, new Path(ledger(root), s"manifest.$gen"),
      files.sorted.mkString("\n"))
    writeAtomic(fs, currentPath(root), gen.toString)
  }

  /** Append one batch as a new immutable part and publish the next
    * generation (old files + the new part's files). */
  def append(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, dir)
    fs.mkdirs(ledger(root))
    val gen = currentGen(spark, dir)
    val rel = s"parts/b_${java.util.UUID.randomUUID().toString.take(12)}"
    df.coalesce(1).write.parquet(new Path(root, rel).toString)
    publish(fs, root, gen + 1,
      manifestFiles(fs, root, gen) ++ filesUnder(fs, root, rel))
  }

  /** The committed snapshot as of CURRENT — resolved ONCE, so the
    * returned plan reads this exact file set for its whole lifetime
    * regardless of concurrent writers. Empty-store reads throw (no
    * schema to serve). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (fs, root) = fsOf(spark, dir)
    val gen = currentGen(spark, dir)
    require(gen > 0L, s"empty snapshot store at $dir")
    val files = manifestFiles(fs, root, gen)
      .map(f => new Path(root, f).toString)
    spark.read.parquet(files: _*)
  }

  /** Fold the current generation into one part (via `fold`, default
    * identity — pure file compaction) and publish it as the next
    * generation. Superseded parts stay on disk for in-flight readers;
    * [[retire]] reclaims them. */
  def compact(spark: SparkSession, dir: String,
              fold: DataFrame => DataFrame = identity): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val gen = currentGen(spark, dir)
    if (gen == 0L) return
    val rel = s"parts/c_${java.util.UUID.randomUUID().toString.take(12)}"
    fold(read(spark, dir)).coalesce(1)
      .write.parquet(new Path(root, rel).toString)
    publish(fs, root, gen + 1, filesUnder(fs, root, rel))
  }

  // ---- generalized manifest primitives (bucket / multi-table grain) -
  // The single-table API above folds whole generations; the BUCKETED
  // stores (BM25 postings + meta, the corpus-increment artifact set)
  // need the same isolation at a finer grain: a compaction replaces
  // SOME lines of the manifest (one bucket's files) while the rest
  // ride through, and one generation spans several logical tables.
  // The manifest format already carries that — lines are arbitrary
  // store-relative file paths — so the generalization is just the
  // primitives: writers organize subtrees (`parts/p_x/bucket=3/...`),
  // publish the next generation as a transformed line set, and
  // readers resolve CURRENT once then SELECT lines by prefix/bucket.
  // Same crash faces as the single-table API (manifests and CURRENT
  // are rename-published; unpublished files are invisible orphans),
  // same single-writer / unlimited-reader contract.

  /** The committed file list (store-relative) of the current
    * generation. */
  private[graft] def currentFiles(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    manifestFiles(fs, root, currentGen(spark, dir))
  }

  /** Publish `files` as the next generation; returns its number. */
  private[graft] def publishNext(spark: SparkSession, dir: String,
                                 files: Seq[String]): Long = {
    val (fs, root) = fsOf(spark, dir)
    fs.mkdirs(ledger(root))
    val gen = currentGen(spark, dir) + 1
    publish(fs, root, gen, files)
    gen
  }

  /** Data files (recursive, store-relative) under a freshly written
    * subtree — what a writer feeds [[publishNext]]. */
  private[graft] def partFiles(spark: SparkSession, dir: String,
                               rel: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    filesUnder(fs, root, rel)
  }

  /** Plan over an exact store-relative file list (the reader's half:
    * resolve [[currentFiles]] once, select lines, read — the plan is
    * pinned to those files for its lifetime). */
  private[graft] def readFiles(spark: SparkSession, dir: String,
                               files: Seq[String]): DataFrame = {
    require(files.nonEmpty, s"no files to read under $dir")
    val (_, root) = fsOf(spark, dir)
    spark.read.parquet(files.map(f => new Path(root, f).toString): _*)
  }

  /** FILE-grain retirement for bucket-compacted stores: [[retire]]
    * reclaims at the part-DIRECTORY grain, but a bucket compaction
    * supersedes single files inside part dirs that stay live for
    * their other buckets. Deletes every data file under the store's
    * data subtrees unreferenced by the newest `keepGenerations`
    * manifests, prunes directories left holding only job markers,
    * and drops manifests past the window — the same grace bargain as
    * [[retire]]. */
  private[graft] def retireFileGrain(spark: SparkSession, dir: String,
                                     keepGenerations: Int = 2): Unit = {
    require(keepGenerations >= 1, "keepGenerations must be >= 1")
    val (fs, root) = fsOf(spark, dir)
    val gen = currentGen(spark, dir)
    if (gen == 0L) return
    val keep = ((gen - keepGenerations + 1) max 1L) to gen
    val live = keep.flatMap(g =>
      try manifestFiles(fs, root, g)
      catch { case _: java.io.FileNotFoundException => Nil }).toSet
    def meta(n: String) = n.startsWith("_") || n.startsWith(".")
    def sweep(p: Path): Unit = {
      fs.listStatus(p).foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory) sweep(s.getPath)
        else if (!meta(n) && !live.contains(
            s.getPath.toString.stripPrefix(root.toString).stripPrefix("/"))) {
          fs.delete(s.getPath, false)
          ()
        }
      }
      // a dir left with only job markers (_SUCCESS and friends) holds
      // no live data — prune it whole
      if (fs.listStatus(p).forall(s => s.isFile && meta(s.getPath.getName))) {
        fs.delete(p, true)
        ()
      }
    }
    fs.listStatus(root).foreach { s =>
      if (s.isDirectory && !meta(s.getPath.getName)) sweep(s.getPath)
    }
    fs.listStatus(ledger(root)).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("manifest.") &&
          n.stripPrefix("manifest.").toLongOption.exists(_ < keep.head)) {
        fs.delete(s.getPath, false)
        ()
      }
    }
  }

  /** Delete parts unreferenced by the newest `keepGenerations`
    * manifests (>= 1 — CURRENT is always kept), plus orphaned part
    * dirs no manifest ever published (torn writers), plus manifests
    * older than the grace window. The caller sizes the window to its
    * longest-running reader. */
  def retire(spark: SparkSession, dir: String, keepGenerations: Int = 2): Unit = {
    require(keepGenerations >= 1, "keepGenerations must be >= 1")
    val (fs, root) = fsOf(spark, dir)
    val gen = currentGen(spark, dir)
    if (gen == 0L) return
    val keep = ((gen - keepGenerations + 1) max 1L) to gen
    val live = keep.flatMap(g =>
      try manifestFiles(fs, root, g)
      catch { case _: java.io.FileNotFoundException => Nil }).toSet
    val partsRoot = new Path(root, "parts")
    if (fs.exists(partsRoot)) fs.listStatus(partsRoot).foreach { d =>
      val rel = d.getPath.toString.stripPrefix(root.toString).stripPrefix("/")
      val referenced = live.exists(_.startsWith(rel + "/")) ||
        live.contains(rel)
      if (!referenced) fs.delete(d.getPath, true)
      ()
    }
    fs.listStatus(ledger(root)).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("manifest.") &&
          n.stripPrefix("manifest.").toLongOption.exists(_ < keep.head)) {
        fs.delete(s.getPath, false)
        ()
      }
    }
  }
}
