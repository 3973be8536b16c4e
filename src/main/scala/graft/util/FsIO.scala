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
    * copy — run compaction jobs there against a staging prefix. */
  def swapDir(spark: SparkSession, tmp: Path, dst: Path): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dst.getFileSystem(conf)
    val qDst = fs.makeQualified(dst)
    val qTmp = fs.makeQualified(tmp)
    val aside = new Path(qDst.getParent, qDst.getName + ".__pre_swap")
    if (fs.exists(aside)) fs.delete(aside, true)
    if (!fs.rename(qDst, aside))
      throw new java.io.IOException(s"swapDir: could not move $qDst aside")
    if (!fs.rename(qTmp, qDst)) {
      fs.rename(aside, qDst) // roll the original back
      throw new java.io.IOException(
        s"swapDir: could not move $qTmp into place ($qDst restored)")
    }
    fs.delete(aside, true)
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
