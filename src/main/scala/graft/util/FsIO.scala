package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-sidecar I/O over the Hadoop FileSystem API (hdfs://, s3a://,
  * local) with the two hardening properties every metadata sidecar needs:
  *
  *  - ATOMIC writes: content goes to a `.tmp` sibling first and is
  *    renamed into place, so a crashed writer can never leave a truncated
  *    sidecar where the real one was — readers see the old version or the
  *    new one, never a prefix.
  *  - Graceful reads: a missing or unreadable file (checksum mismatch,
  *    permissions, truncation) returns None instead of throwing, because
  *    sidecars are optimizations and must degrade to "not present".
  */
object FsIO {

  def writeStringAtomic(spark: SparkSession, p: Path, content: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val qualified = fs.makeQualified(p)
    val tmp = new Path(qualified.getParent, qualified.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // overwrite-rename via FileContext: one metadata operation on HDFS and
    // local filesystems — no delete-then-rename window where a crash could
    // leave NEITHER version behind. (Object stores emulate rename by copy;
    // there the read-side corruption detection is the backstop.)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(qualified.toUri, conf)
    fc.rename(tmp, qualified, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Replace directory `dst` with fully-written directory `tmp` in two
    * renames: `dst` is moved aside first, so a crash window leaves
    * either the original or the new version in place (plus at worst an
    * orphaned `.__pre_swap` to clean up), never a half-deleted index.
    * A failed second rename rolls the original back. Renames are
    * metadata-only on HDFS/local filesystems; object stores emulate by
    * copy — run compaction jobs there against a staging prefix.
    *
    * TWO documented availability gaps, both absent from the versioned
    * [[publishVersion]] scheme the index families now use:
    *  - between the two renames `dst` does not exist, so a reader that
    *    plans or lists during the window fails spuriously;
    *  - a crash inside that window leaves NO `dst` (the original parked
    *    at `.__pre_swap`, the new version at the caller's tmp) — recover
    *    by renaming `.__pre_swap` back to `dst` manually.
    * Kept for callers that need literal in-place replacement of an
    * unversioned directory and can tolerate (or externally exclude)
    * concurrent readers. */
  def swapDir(spark: SparkSession, tmp: Path, dst: Path): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dst.getFileSystem(conf)
    val qDst = fs.makeQualified(dst)
    val qTmp = fs.makeQualified(tmp)
    val aside = new Path(qDst.getParent, qDst.getName + ".__pre_swap")
    if (fs.exists(aside)) fs.delete(aside, true)
    if (!fs.rename(qDst, aside))
      throw new java.io.IOException(s"swapDir: could not move $qDst aside")
    // some FileSystem implementations THROW on a missing/invalid source
    // instead of returning false — treat both as the same failure so the
    // rollback below always runs and the original is never left parked
    val moved =
      try fs.rename(qTmp, qDst)
      catch { case _: java.io.IOException => false }
    if (!moved) {
      fs.rename(aside, qDst) // roll the original back
      throw new java.io.IOException(
        s"swapDir: could not move $qTmp into place ($qDst restored)")
    }
    fs.delete(aside, true)
  }

  // ---- versioned index directories: reader-invisible rebuilds ----------
  //
  // An index root holds version subdirectories `v1, v2, ...` plus a
  // `_current` pointer sidecar naming the active one. Readers resolve
  // the pointer ONCE at plan time ([[indexDataDir]]) and then only ever
  // touch that version's files; a rebuild/compaction writes the next
  // version in full ([[nextVersionDir]]) — invisible until published —
  // and [[publishVersion]] flips the pointer atomically (the
  // [[writeStringAtomic]] rename law), then garbage-collects every
  // version EXCEPT the new one and the one it superseded. Keeping the
  // superseded version is what closes swapDir's reader window: a probe
  // planned against vN keeps executing correctly through a concurrent
  // publish of vN+1 and is only at risk once a SECOND publish GCs vN —
  // two full maintenance cycles, not a rename-to-rename gap.
  // Crash-safety: an unpublished version dir is invisible (the pointer
  // still names the old one) and swept by the next successful publish.

  private def versionGen(name: String): Option[Long] =
    if (name.length > 1 && name.head == 'v' && name.tail.forall(_.isDigit))
      Some(name.tail.toLong)
    else None

  /** The directory holding the index's CURRENT tables and sidecars:
    * `root/<_current>` under the versioned layout, `root` itself for a
    * legacy flat index (CONFIRMED-absent `_current` sidecar) — so
    * readers of either layout go through this one resolve.
    *
    * The pointer is read STRICTLY ([[readStringStrict]]): a transient
    * read error or a corrupt pointer THROWS instead of falling back to
    * the root, because for an index migrated in place the root may
    * still hold the dead pre-migration flat tables — a silent fallback
    * there would serve stale data and route appends into a copy the
    * next publish deletes. Only "file confirmed absent" means legacy. */
  def indexDataDir(spark: SparkSession, root: String): String =
    readStringStrict(spark, new Path(root, "_current")) match {
      case Some(v) if versionGen(v.trim).isDefined =>
        new Path(root, v.trim).toString
      case Some(junk) => throw new java.io.IOException(
        s"corrupt _current pointer under $root: '${junk.take(40)}' is not a v<N> name")
      case None => root
    }

  /** Throw unless `root`'s `_current` still resolves to `dataDir` — the
    * POST-append check every incremental index append runs: appends go
    * into the version resolved at call start, and if a rebuild or
    * compaction published concurrently the appended rows landed in a
    * superseded version that the next publish garbage-collects. The old
    * flat layout failed loudly on such writer races (concurrent
    * part-file conflicts); this keeps the versioned layout comparably
    * loud instead of silently losing the append.
    *
    * BEST-EFFORT detection, not a closed window: a publish that lands
    * AFTER this check returns (or in the instants between the append's
    * commit and the pointer read) still strands the appended rows
    * silently. The real contract is the single-writer rule — one
    * maintenance writer per index root at a time; this check only makes
    * the common violation (a compaction racing a routine append) loud
    * enough to notice. */
  def assertStillCurrent(spark: SparkSession, root: String,
      dataDir: String): Unit = {
    val now = indexDataDir(spark, root)
    if (now != dataDir)
      throw new java.util.ConcurrentModificationException(
        s"append targeted $dataDir but $root now points at $now: a " +
        "rebuild/compaction published mid-append (single-writer rule " +
        "violated), so the appended rows sit in a superseded version " +
        "and will be GCed - re-run the append against the new version")
  }

  /** A fresh, not-yet-published version directory under `root`
    * (max existing generation + 1 — orphaned unpublished dirs count,
    * so a crashed rebuild can never collide with the next one). */
  def nextVersionDir(spark: SparkSession, root: String): Path = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next =
      if (!fs.exists(rootP)) 1L
      else fs.listStatus(rootP).toSeq
        .flatMap(s => versionGen(s.getPath.getName)).maxOption.getOrElse(0L) + 1L
    new Path(rootP, s"v$next")
  }

  /** Atomically activate `versionDir` (a fully-written child of `root`)
    * and GC: every version directory except the newly published one and
    * the newest `keepVersions` of its superseded lineage is deleted —
    * in-flight readers of a retained version keep working; anything
    * older (or orphaned by a crashed rebuild — a v<N> above the
    * superseded pointer that was never published) goes. The default
    * `keepVersions = 1` retains exactly the version this publish
    * supersedes, so a reader that planned against it survives until a
    * SECOND publish; raise it when long-running probes coexist with an
    * aggressive compaction cadence (a reader planned at vN survives
    * `keepVersions` subsequent publishes).
    *
    * LEGACY-FLAT MIGRATION: the first publish over a flat root (no
    * `_current`) keeps the old flat tables in place — they are the
    * superseded snapshot in-flight readers still scan — and RECORDS
    * their names in a `_flat_children` sidecar. The next publish
    * (pointer already a version, so the flat data is at least one full
    * cycle stale) deletes exactly the recorded names and the sidecar,
    * so the dead flat copy can never again be resolved or appended into
    * ([[indexDataDir]]'s strict read is the other half of that
    * guarantee) — while any FOREIGN file a user co-locates at the root
    * after migration (notes, exported artifacts, a model dir) is never
    * touched by later compactions. A root migrated before the sidecar
    * existed simply keeps its stale flat files: unreachable (the strict
    * pointer wins), just unswept. The flat epoch counts as ONE
    * superseded slot regardless of `keepVersions`. */
  def publishVersion(spark: SparkSession, root: String, versionDir: Path,
      keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1 (got $keepVersions)")
    val rootP = new Path(root)
    val name = versionDir.getName
    require(versionGen(name).isDefined,
      s"publishVersion: $versionDir is not a v<N> directory")
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev = readStringStrict(spark, new Path(rootP, "_current")).map(_.trim)
    val prevGen = prev.flatMap(versionGen)
    val flatList = new Path(rootP, "_flat_children")
    val pointerFiles = Set("_current", "_current.tmp",
      "_flat_children", "_flat_children.tmp")
    if (prevGen.isEmpty && fs.exists(rootP)) {
      // migrating publish: record the flat epoch's children (before the
      // pointer flips, so a crash here just re-records on retry)
      val flat = fs.listStatus(rootP).toSeq.map(_.getPath.getName)
        .filter(n => versionGen(n).isEmpty && !pointerFiles(n))
      if (flat.nonEmpty)
        writeStringAtomic(spark, flatList, flat.mkString("\n"))
    }
    writeStringAtomic(spark, new Path(rootP, "_current"), name)
    val children = fs.listStatus(rootP).toSeq.map(_.getPath)
    // superseded lineage = version dirs at or below the superseded
    // pointer (anything above it other than `name` is an unpublished
    // orphan), newest first, capped at keepVersions
    val lineage = children.map(_.getName)
      .flatMap(n => versionGen(n).map(g => (g, n)))
      .filter { case (g, n) => n != name && prevGen.exists(g <= _) }
      .sortBy(-_._1).take(keepVersions).map(_._2)
    val keep = Set(name) ++ lineage
    children
      .filter(p => versionGen(p.getName).isDefined && !keep(p.getName))
      .foreach(p => fs.delete(p, true))
    // sweep the RECORDED flat-epoch children only — never a blanket
    // delete of everything non-version (which destroyed foreign files
    // users co-located at the root, ADVICE r16)
    if (prevGen.isDefined)
      readString(spark, flatList).foreach { content =>
        content.split("\n").map(_.trim).filter(_.nonEmpty)
          .filter(n => versionGen(n).isEmpty && !pointerFiles(n))
          .foreach { n =>
            val p = new Path(rootP, n)
            if (fs.exists(p)) fs.delete(p, true)
          }
        fs.delete(flatList, false)
      }
  }

  /** Strict read for LOAD-BEARING pointer sidecars: Some(content) when
    * present and readable, None ONLY when the file is CONFIRMED absent,
    * and any I/O error rethrown — unlike [[readString]], which degrades
    * errors to None because ordinary sidecars are best-effort
    * optimizations. A `_current` pointer is not: "unreadable" treated
    * as "absent" is indistinguishable from the legacy-flat case and
    * silently redirects reads AND appends to dead data. */
  def readStringStrict(spark: SparkSession, p: Path): Option[String] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  def readString(spark: SparkSession, p: Path): Option[String] =
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      }
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[FsIO] $p unreadable (${e.getMessage}); treating as absent")
        None
    }
}
