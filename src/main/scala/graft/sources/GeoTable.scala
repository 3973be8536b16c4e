package graft.sources

import graft.functions.GeoFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geometry-aware parquet tables with file-level bbox pruning.
  *
  * The reference has no file sources (MemTable only); Spark supplies
  * parquet natively. What parquet cannot do by itself is prune files by a
  * SPATIAL predicate — min/max column statistics don't exist for a binary
  * WKB column. GeoTable writes a tiny `_geo_meta.json` sidecar holding the
  * bounding box of every parquet file; [[readIntersecting]] then opens
  * only the files whose bbox intersects the query envelope.
  *
  * At 100 TB this is the difference between scanning every file and
  * scanning the spatial partition a query touches — the same file-skipping
  * lever Catalyst uses for numeric min/max, extended to geometry. Pair
  * with [[writePartitionedByLocation]] (range-partition by cell id before
  * writing) so files have tight, disjoint bboxes and pruning actually
  * bites.
  */
object GeoTable {

  private case class FileBox(file: String, xmin: Double, ymin: Double,
      xmax: Double, ymax: Double)

  /** Write `df` as parquet plus the per-file bbox sidecar. */
  def write(df: DataFrame, path: String, geomCol: String,
      mode: String = "overwrite"): Unit = {
    df.write.mode(mode).parquet(path)
    writeSidecar(df.sparkSession, path, geomCol)
  }

  /** Write with location clustering: rows are range-partitioned by grid
    * cell of the geometry before writing, giving files tight disjoint
    * bboxes (without it, every file's bbox ≈ the global extent and
    * pruning never skips anything). */
  def writePartitionedByLocation(df: DataFrame, path: String, geomCol: String,
      cellSize: Double, numFiles: Int, mode: String = "overwrite"): Unit = {
    GeoFunctions.register(df.sparkSession)
    val bb = GeoFunctions.box2d(col(geomCol))
    val cell = struct(
      floor(bb.getField("xmin") / cellSize).as("cx"),
      floor(bb.getField("ymin") / cellSize).as("cy"))
    df.withColumn("__cell", cell)
      .repartitionByRange(numFiles, col("__cell"))
      .drop("__cell")
      .write.mode(mode).parquet(path)
    writeSidecar(df.sparkSession, path, geomCol)
  }

  private def writeSidecar(spark: SparkSession, path: String, geomCol: String): Unit = {
    GeoFunctions.register(spark)
    val bb = GeoFunctions.box2d(col(geomCol))
    // empty geometries have a null box2d and never intersect any envelope,
    // so excluding them from the stats (and all-empty files from the
    // sidecar entirely) is exact, not an approximation
    val boxes = spark.read.parquet(path)
      .select(input_file_name().as("file"), bb.as("bb"))
      .where(col("bb").isNotNull)
      .groupBy("file")
      .agg(min(col("bb.xmin")).as("xmin"), min(col("bb.ymin")).as("ymin"),
        max(col("bb.xmax")).as("xmax"), max(col("bb.ymax")).as("ymax"))
      .collect()
      .map(r => FileBox(r.getString(0),
        sane(r.getDouble(1), -Double.MaxValue), sane(r.getDouble(2), -Double.MaxValue),
        sane(r.getDouble(3), Double.MaxValue), sane(r.getDouble(4), Double.MaxValue)))
    // the leading count lets readers detect a torn/truncated entry list
    val json = boxes.map { b =>
      s"""{"file": "${escape(b.file)}", "xmin": ${b.xmin}, "ymin": ${b.ymin},""" +
        s""" "xmax": ${b.xmax}, "ymax": ${b.ymax}}"""
    }.mkString(s"""{"count": ${boxes.length}}\n[""", ",\n ", "]")
    graft.util.FsIO.writeStringAtomic(spark, sidecarPath(path), json)
  }

  /** Non-finite coordinates (NaN/Infinity from corrupt data) widen the
    * file's bound to "always read" rather than poisoning the sidecar —
    * pruning must never silently drop a file. */
  private def sane(v: Double, fallback: Double): Double =
    if (java.lang.Double.isFinite(v)) v else fallback

  // sidecar I/O goes through graft.util.FsIO (Hadoop FileSystem API, so
  // GeoTable works on hdfs:// and s3a:// paths; atomic temp+rename writes,
  // unreadable files degrade to None)
  private def sidecarPath(table: String) =
    new org.apache.hadoop.fs.Path(table, "_geo_meta.json")

  private val countHeader = """"count": (\d+)""".r

  /** None = sidecar absent or corrupt (unreadable, torn entry list, or a
    * declared count that doesn't match the parsed entries) — callers must
    * fall back to a full read; pruning can never be a gate. */
  private def sidecarEntries(spark: SparkSession, path: String): Option[Seq[FileBox]] =
    graft.util.FsIO.readString(spark, sidecarPath(path)).flatMap { json =>
      val entries = parseSidecar(json)
      // toIntOption: a count whose digits overflow Int is a corrupt
      // sidecar, which must degrade to a full read, never throw
      countHeader.findFirstMatchIn(json).map(_.group(1).toIntOption) match {
        case Some(Some(n)) if n == entries.length => Some(entries)
        case Some(_) => None // torn write: header disagrees or overflows
        // legacy headerless sidecars are accepted only when the entry list
        // closes properly — a truncated prefix parses to SOME entries and
        // must not silently prune away the lost files
        case None if json.trim.endsWith("]") &&
          (entries.nonEmpty || json.trim == "[]") => Some(entries)
        case None => None // garbage or torn legacy write
      }
    }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Read only the files whose bbox intersects the query envelope —
    * file-level spatial pruning off the sidecar. Falls back to a full
    * read when the sidecar is absent OR corrupt: pruning is an
    * optimization and must never silently drop data. */
  def readIntersecting(spark: SparkSession, path: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): DataFrame =
    sidecarEntries(spark, path) match {
      case None => read(spark, path)
      case Some(entries) =>
        val files = entries
          .filter(b => b.xmin <= xmax && b.xmax >= xmin && b.ymin <= ymax && b.ymax >= ymin)
          .map(_.file)
        if (files.isEmpty)
          spark.read.parquet(path).limit(0) // keep the schema, read nothing
        else spark.read.parquet(files: _*)
    }

  /** How many files the envelope touches vs total — exposed so callers
    * (and tests) can observe pruning effectiveness. (0, 0) when the
    * sidecar is absent or corrupt. */
  def pruningStats(spark: SparkSession, path: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): (Int, Int) = {
    val boxes = sidecarEntries(spark, path).getOrElse(Seq.empty)
    val hit = boxes.count(b =>
      b.xmin <= xmax && b.xmax >= xmin && b.ymin <= ymax && b.ymax >= ymin)
    (hit, boxes.length)
  }

  // sidecar format is our own single-level JSON — a 20-line parser beats a
  // dependency (zero-egress build: no JSON library available anyway).
  // Paths are escaped on write and unescaped here, so quotes/backslashes
  // in file names round-trip instead of corrupting the sidecar.
  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case e => out += e; i += 2
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  private def parseSidecar(json: String): Seq[FileBox] = {
    val entry = """\{"file": "((?:[^"\\]|\\.)*)", "xmin": ([-0-9.eE]+), "ymin": ([-0-9.eE]+), "xmax": ([-0-9.eE]+), "ymax": ([-0-9.eE]+)\}""".r
    entry.findAllMatchIn(json).map { m =>
      FileBox(unescape(m.group(1)), m.group(2).toDouble, m.group(3).toDouble,
        m.group(4).toDouble, m.group(5).toDouble)
    }.toSeq
  }
}
