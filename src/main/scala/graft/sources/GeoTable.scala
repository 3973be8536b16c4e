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
    val json = boxes.map { b =>
      s"""{"file": "${escape(b.file)}", "xmin": ${b.xmin}, "ymin": ${b.ymin},""" +
        s""" "xmax": ${b.xmax}, "ymax": ${b.ymax}}"""
    }.mkString("[", ",\n ", "]")
    writeString(spark, sidecarPath(path), json)
  }

  /** Non-finite coordinates (NaN/Infinity from corrupt data) widen the
    * file's bound to "always read" rather than poisoning the sidecar —
    * pruning must never silently drop a file. */
  private def sane(v: Double, fallback: Double): Double =
    if (java.lang.Double.isFinite(v)) v else fallback

  // sidecar I/O goes through the Hadoop FileSystem API so GeoTable works
  // on hdfs:// and s3a:// paths, not just the local filesystem
  private def sidecarPath(table: String) =
    new org.apache.hadoop.fs.Path(table, "_geo_meta.json")

  private def writeString(spark: SparkSession,
      p: org.apache.hadoop.fs.Path, content: String): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  // an unreadable sidecar (checksum mismatch, permission, truncation) must
  // degrade to "no sidecar" — pruning is an optimization, never a gate
  private def readString(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): Option[String] =
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
        System.err.println(s"[GeoTable] sidecar $p unreadable (${e.getMessage}); full read")
        None
    }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Read only the files whose bbox intersects the query envelope —
    * file-level spatial pruning off the sidecar. Falls back to a full
    * read when the sidecar is absent OR unparseable: pruning is an
    * optimization and must never silently drop data, so a sidecar that
    * exists but yields zero entries without being the literal empty list
    * is treated as corrupt. */
  def readIntersecting(spark: SparkSession, path: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): DataFrame =
    readString(spark, sidecarPath(path)) match {
      case None => read(spark, path)
      case Some(json) =>
        val entries = parseSidecar(json)
        if (entries.isEmpty && json.trim != "[]") read(spark, path) // corrupt sidecar
        else {
          val files = entries
            .filter(b => b.xmin <= xmax && b.xmax >= xmin && b.ymin <= ymax && b.ymax >= ymin)
            .map(_.file)
          if (files.isEmpty)
            spark.read.parquet(path).limit(0) // keep the schema, read nothing
          else spark.read.parquet(files: _*)
        }
    }

  /** How many files the envelope touches vs total — exposed so callers
    * (and tests) can observe pruning effectiveness. */
  def pruningStats(spark: SparkSession, path: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): (Int, Int) = {
    val boxes = parseSidecar(readString(spark, sidecarPath(path)).getOrElse(""))
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
