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
  *  - the committed file set is a MANIFEST LIST (r16 — iceberg's
  *    manifest/manifest-list split at this grain): `_ledger/mp_<id>`
  *    files are immutable manifest PARTS, each listing a batch of
  *    live data files (store-relative); `_ledger/manifest.N` lists
  *    the generation's parts as `@mp_<id>` reference lines (plus any
  *    legacy direct file lines — both grammars read forever); and
  *    `_ledger/CURRENT` names N. An append therefore publishes ONE
  *    new manifest part + one small list — O(delta), not O(live
  *    files) — and an edit (bucket compaction, retirement) rewrites
  *    only the parts whose files it touches, reusing every other
  *    part BY REFERENCE across generations (SnapshotStoreSpec pins
  *    the reuse). Publication is one atomic rename of CURRENT —
  *    before it readers resolve generation N-1 complete, after it N
  *    complete, never a mix (the concurrent-reader spec's pin);
  *  - [[read]] resolves CURRENT once and plans over that exact file
  *    list, so a query keeps its snapshot for its whole lifetime even
  *    across concurrent appends/compactions (files it references
  *    outlive it — see retire); `read(dir, gen)` serves any
  *    generation still inside the grace window (AS-OF time travel);
  *  - [[compact]] folds the current generation into one new part and
  *    publishes the next manifest; superseded files are NOT deleted
  *    at publish time — [[retire]] deletes parts unreferenced by the
  *    last `keepGenerations` manifests, the grace window in-flight
  *    readers run inside (the same bargain iceberg's
  *    expire-snapshots strikes). A crash ANYWHERE leaves either the
  *    old CURRENT (unpublished parts are invisible orphans retire
  *    sweeps) or the new one (complete by construction) — no journal
  *    replay needed, which is why this store needs no rollback journal.
  *
  * Single concurrent WRITER by contract, readers unlimited — and the
  * contract is ENFORCED at publish (r16): every mutating operation
  * claims a fencing epoch (`_ledger/fence.E`, created exclusively —
  * the create-no-overwrite rename trick, so two claimants cannot both
  * own E) BEFORE reading the state it transforms, and `publish`
  * refuses (throws) when a newer epoch exists. A split-brain second
  * driver can therefore never silently drop the first's lines: the
  * writer whose read predates the other's claim fails fast instead of
  * publishing a manifest computed from a stale generation.
  *
  * Write amplification is unchanged vs the journaled stores (one new
  * part per append/compaction); the cost of isolation is deferred
  * space reclamation, bounded by the grace window.
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

  /** Generations still resolvable on disk (ascending) — the AS-OF
    * surface: any of these can be pinned by `read(dir, gen)` /
    * [[filesAsOf]] until retirement drops it past the grace window. */
  def generations(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(ledger(root))) Nil
    else fs.listStatus(ledger(root)).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith("manifest."))
      .flatMap(_.stripPrefix("manifest.").toLongOption)
      .toSeq.sorted
  }

  // ---- manifest-list internals ---------------------------------------

  /** RAW manifest lines of generation `gen`: `@mp_<id>` part
    * references and/or legacy direct file lines. */
  private def manifestLines(fs: FileSystem, root: Path, gen: Long): Seq[String] =
    if (gen == 0L) Nil
    else readFile(fs, new Path(ledger(root), s"manifest.$gen"))
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** The data files listed by one manifest part. */
  private def partLines(fs: FileSystem, root: Path, ref: String): Seq[String] =
    readFile(fs, new Path(ledger(root), ref.stripPrefix("@")))
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Expand a manifest's raw lines to its data-file list. */
  private def expand(fs: FileSystem, root: Path, lines: Seq[String]): Seq[String] =
    lines.flatMap { l =>
      if (l.startsWith("@")) partLines(fs, root, l) else Seq(l)
    }

  /** Store-relative live files of generation `gen` (expanded). */
  private def manifestFiles(fs: FileSystem, root: Path, gen: Long): Seq[String] =
    expand(fs, root, manifestLines(fs, root, gen))

  /** Write one immutable manifest part; returns its `@` reference. */
  private def writeManifestPart(fs: FileSystem, root: Path,
                                files: Seq[String]): String = {
    val name = s"mp_${java.util.UUID.randomUUID().toString.take(12)}"
    writeAtomic(fs, new Path(ledger(root), name),
      files.sorted.mkString("\n"))
    "@" + name
  }

  /** The next generation's raw lines for a target file set `files`,
    * REUSING the previous generation's manifest parts: a part none of
    * whose files left the set rides through by reference (zero
    * writes); a touched part is rewritten once with its survivors;
    * files new to the set land in one fresh part. Publish cost is
    * thus O(delta + touched parts), never O(live files). */
  private def deltaLines(fs: FileSystem, root: Path,
                         prevRaw: Seq[String], files: Seq[String]): Seq[String] = {
    val target = files.toSet
    val (refs, directs) = prevRaw.partition(_.startsWith("@"))
    val keptDirect = directs.filter(target)
    val covered = scala.collection.mutable.Set.empty[String]
    covered ++= keptDirect
    val outRefs = refs.flatMap { r =>
      val fl = partLines(fs, root, r)
      val kept = fl.filter(f => target.contains(f) && !covered.contains(f))
      covered ++= kept
      if (kept.isEmpty) None
      else if (kept.length == fl.length) Some(r)
      else Some(writeManifestPart(fs, root, kept))
    }
    val added = files.distinct.filterNot(covered)
    val addRef =
      if (added.nonEmpty) Seq(writeManifestPart(fs, root, added)) else Nil
    (keptDirect.sorted ++ outRefs ++ addRef)
  }

  // ---- writer fencing --------------------------------------------------

  private def maxFence(fs: FileSystem, root: Path): Long =
    if (!fs.exists(ledger(root))) 0L
    else fs.listStatus(ledger(root)).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith("fence."))
      .flatMap(_.stripPrefix("fence.").toLongOption)
      .maxOption.getOrElse(0L)

  /** Claim the store's next writer epoch — call BEFORE reading the
    * state the operation transforms, pass the token to the fenced
    * publish. The claim file is created WITHOUT overwrite (atomic on
    * HDFS/local — the same trick CURRENT's rename publication uses),
    * so two racing claimants can never both own an epoch; the loser
    * retries one higher. */
  private[graft] def acquireFence(spark: SparkSession, dir: String): Long = {
    val (fs, root) = fsOf(spark, dir)
    fs.mkdirs(ledger(root))
    var tries = 0
    while (tries < 64) {
      val next = maxFence(fs, root) + 1
      try {
        fs.create(new Path(ledger(root), s"fence.$next"), false).close()
        return next
      } catch { case _: java.io.IOException => tries += 1 }
    }
    throw new java.io.IOException(s"could not claim a writer fence at $dir")
  }

  /** Fail fast when a newer writer has claimed the store: publishing
    * a manifest computed from a pre-claim read would silently drop
    * the newer writer's lines. */
  private def checkFence(fs: FileSystem, root: Path, fence: Long,
                         dir: String): Unit = {
    val newest = maxFence(fs, root)
    if (newest != fence)
      throw new IllegalStateException(
        s"stale writer at $dir: fence $fence superseded by $newest — " +
          "a newer writer claimed the store after this operation read " +
          "its generation; publishing would drop the newer writer's lines")
  }

  /** Rename-publish `manifest.gen`, refusing to clobber a CONCURRENT
    * writer's manifest: a collision with the fence still newest can
    * only be this store's own torn previous attempt (manifest written,
    * CURRENT swap never ran, same generation recomputed) — safe to
    * replace; any other collision re-triggers the fence check's
    * stale-writer fail-fast. */
  private def publish(fs: FileSystem, root: Path, gen: Long,
                      rawLines: Seq[String], fence: Long, dir: String): Unit = {
    checkFence(fs, root, fence, dir)
    val p = new Path(ledger(root), s"manifest.$gen")
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val o = fs.create(tmp, true)
    try o.write(rawLines.mkString("\n").getBytes("UTF-8")) finally o.close()
    if (!fs.rename(tmp, p)) {
      checkFence(fs, root, fence, dir)
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"manifest rename failed: $tmp -> $p")
    }
    writeAtomic(fs, currentPath(root), gen.toString)
  }

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

  /** Append one batch as a new immutable part and publish the next
    * generation: every prior manifest part rides through by
    * reference, the batch's files land in one new part — O(delta). */
  def append(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, dir)
    fs.mkdirs(ledger(root))
    val fence = acquireFence(spark, dir)
    val gen = currentGen(spark, dir)
    val rel = s"parts/b_${java.util.UUID.randomUUID().toString.take(12)}"
    df.coalesce(1).write.parquet(new Path(root, rel).toString)
    val prevRaw = manifestLines(fs, root, gen)
    val newPart = writeManifestPart(fs, root, filesUnder(fs, root, rel))
    publish(fs, root, gen + 1, prevRaw :+ newPart, fence, dir)
  }

  /** The committed snapshot as of CURRENT — resolved ONCE, so the
    * returned plan reads this exact file set for its whole lifetime
    * regardless of concurrent writers. Empty-store reads throw (no
    * schema to serve). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val gen = currentGen(spark, dir)
    require(gen > 0L, s"empty snapshot store at $dir")
    read(spark, dir, gen)
  }

  /** AS-OF read: the store as of generation `asOfGen` — time-travel
    * debugging for any generation still inside the grace window
    * (retired generations' manifests are gone and throw). */
  def read(spark: SparkSession, dir: String, asOfGen: Long): DataFrame = {
    val (fs, root) = fsOf(spark, dir)
    require(asOfGen > 0L, s"generation must be >= 1 at $dir")
    val files = manifestFiles(fs, root, asOfGen)
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
    val fence = acquireFence(spark, dir)
    val gen = currentGen(spark, dir)
    if (gen == 0L) return
    val rel = s"parts/c_${java.util.UUID.randomUUID().toString.take(12)}"
    fold(read(spark, dir)).coalesce(1)
      .write.parquet(new Path(root, rel).toString)
    val part = writeManifestPart(fs, root, filesUnder(fs, root, rel))
    publish(fs, root, gen + 1, Seq(part), fence, dir)
  }

  // ---- generalized manifest primitives (bucket / multi-table grain) -
  // The single-table API above folds whole generations; the BUCKETED
  // stores (BM25 postings + meta, the corpus-increment artifact set)
  // need the same isolation at a finer grain: a compaction replaces
  // SOME lines of the manifest (one bucket's files) while the rest
  // ride through, and one generation spans several logical tables.
  // The manifest format already carries that — expanded lines are
  // arbitrary store-relative file paths — so the generalization is
  // just the primitives: writers claim a fence, organize subtrees
  // (`parts/p_x/bucket=3/...`), publish the next generation as a
  // transformed FILE set (the delta against the prior generation's
  // parts is computed here, so untouched manifest parts are reused by
  // reference), and readers resolve CURRENT once then SELECT files by
  // prefix/bucket. Same crash faces as the single-table API
  // (manifests, parts, and CURRENT are rename-published; unpublished
  // files are invisible orphans), same fenced single-writer /
  // unlimited-reader contract.

  /** The committed file list (store-relative) of the current
    * generation. */
  private[graft] def currentFiles(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    manifestFiles(fs, root, currentGen(spark, dir))
  }

  /** The committed file list AS OF a pinned generation (the bucketed
    * stores' time-travel surface). */
  private[graft] def filesAsOf(spark: SparkSession, dir: String,
                               gen: Long): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    manifestFiles(fs, root, gen)
  }

  /** Publish `files` as the next generation under the writer epoch
    * `fence` (claim it with [[acquireFence]] BEFORE reading the state
    * the new generation was computed from); returns the generation
    * number. Untouched manifest parts of the prior generation are
    * reused by reference — cost O(delta + touched parts). */
  private[graft] def publishNext(spark: SparkSession, dir: String,
                                 files: Seq[String], fence: Long): Long = {
    val (fs, root) = fsOf(spark, dir)
    fs.mkdirs(ledger(root))
    val gen = currentGen(spark, dir)
    val lines = deltaLines(fs, root, manifestLines(fs, root, gen), files)
    publish(fs, root, gen + 1, lines, fence, dir)
    gen + 1
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

  /** Ledger upkeep shared by both retirement grains: drop manifests
    * past the grace window, manifest parts no kept manifest
    * references, and fence claims below the newest (the live epoch
    * must survive — it is what the next publish checks against). */
  private def sweepLedger(fs: FileSystem, root: Path, keepHead: Long): Unit = {
    val keptRefs = fs.listStatus(ledger(root)).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith("manifest."))
      .filter(_.stripPrefix("manifest.").toLongOption.exists(_ >= keepHead))
      .flatMap(n => manifestLines(fs, root,
        n.stripPrefix("manifest.").toLong).filter(_.startsWith("@")))
      .map(_.stripPrefix("@")).toSet
    val newestFence = maxFence(fs, root)
    fs.listStatus(ledger(root)).foreach { s =>
      val n = s.getPath.getName
      val drop =
        (n.startsWith("manifest.") &&
          n.stripPrefix("manifest.").toLongOption.exists(_ < keepHead)) ||
        (n.startsWith("mp_") && !keptRefs.contains(n)) ||
        (n.startsWith("fence.") &&
          n.stripPrefix("fence.").toLongOption.exists(_ < newestFence))
      if (drop) { fs.delete(s.getPath, false); () }
    }
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
    sweepLedger(fs, root, keep.head)
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
    sweepLedger(fs, root, keep.head)
  }
}
