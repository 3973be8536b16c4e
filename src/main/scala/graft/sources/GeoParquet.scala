package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.functions.GeoFunctions
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.metadata.{FileMetaData, ParquetMetadata}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoParquet 1.0 interop (https://geoparquet.org, spec v1.0.0): write
  * tables whose `geo` file metadata foreign readers (GDAL, DuckDB
  * spatial, geopandas) understand, and read foreign GeoParquet —
  * including file-level bbox pruning off the per-file `geo` metadata,
  * so spatial indexing is PORTABLE in both directions (GeoTable's
  * `_geo_meta.json` sidecar stays as the engine-native fast path; this
  * is the interchange path).
  *
  * Write: the geometry column is exported as RAW WKB binary (the
  * engine-internal 1-byte dialect tag is stripped — foreign readers
  * expect plain WKB), data files are written by Spark's parquet writer,
  * then each file's footer is rewritten to add the `geo` key-value
  * metadata: version, primary_column, encoding "WKB", the FILE's own
  * bbox and geometry_types (per the spec, metadata is per-file, which
  * is exactly what makes foreign bbox pruning work). The footer rewrite
  * streams [0, footerStart) unchanged into a temp file, appends the
  * augmented footer, and renames — row-group/column-index offsets refer
  * to the untouched data section, so they stay valid. Runs as a
  * distributed job (one task per file): at 100 TB the rewrite cost is
  * one streaming pass of each file, spread across the cluster, not a
  * driver loop.
  *
  * Read: the primary geometry column comes from the `geo` metadata of
  * the first footer; WKB is re-tagged into engine geometry (SRID from a
  * `crs` PROJJSON EPSG id when present; the spec's null crs means
  * OGC:CRS84, which we map to 4326). [[readIntersecting]] reads only
  * files whose per-file `geo` bbox intersects the query envelope —
  * pruning works on ANY spec-conforming producer's files, absent or
  * malformed metadata degrades to a full read (pruning is an
  * optimization, never a gate).
  */
object GeoParquet {

  private val GeoKey = "geo"

  /** Export `df` as GeoParquet 1.0: `geomCol` must be an engine
    * geometry column; `srid` stamps the `crs` metadata (4326 → the
    * spec's null/default OGC:CRS84). */
  def write(df: DataFrame, path: String, geomCol: String, srid: Int = 4326,
      mode: String = "overwrite"): Unit =
    writeImpl(df, path, geomCol, srid, mode, covering = false,
      cluster = false, blockSize = None)

  /** Export as GeoParquet 1.1 with a `bbox` COVERING column: each row
    * carries a (xmin, ymin, xmax, ymax) double struct computed from its
    * geometry, declared in the `geo` metadata's `covering` object so
    * foreign readers can use it, and — the Spark-native point — stored
    * as four plain parquet columns whose ROW-GROUP min/max statistics
    * prune. A query that conjoins [[bboxIntersects]] with its exact
    * spatial predicate skips whole row groups at scan time (pushed
    * nested-field range filters), a finer granularity than the per-file
    * footer bbox: at 100 TB a file is ~1 GB but a row group is
    * ~128 MB, so covering-pruning reads up to 8x less of each
    * borderline file — and `cluster = true` (default) sorts rows by the
    * geohash of their bbox center first, which is what makes row-group
    * bboxes tight instead of file-wide. Clustering repartitions by
    * range (one shuffle, documented cost); pass `cluster = false` for
    * already-clustered data or non-lon/lat coordinate systems.
    * `blockSize` overrides `parquet.block.size` (bytes) — smaller row
    * groups prune finer at the cost of more footer overhead. */
  def writeCovered(df: DataFrame, path: String, geomCol: String,
      srid: Int = 4326, mode: String = "overwrite", cluster: Boolean = true,
      blockSize: Option[Long] = None): Unit =
    writeImpl(df, path, geomCol, srid, mode, covering = true, cluster,
      blockSize)

  /** The covering-column range predicate for a query envelope — the
    * row-group-prunable half of a spatial filter. Conjoin with the
    * exact predicate: `.where(bboxIntersects(...) && st_intersects(...))`. */
  def bboxIntersects(xmin: Double, ymin: Double, xmax: Double,
      ymax: Double): org.apache.spark.sql.Column =
    col("bbox.xmax") >= xmin && col("bbox.xmin") <= xmax &&
      col("bbox.ymax") >= ymin && col("bbox.ymin") <= ymax

  /** [[readIntersecting]] plus covering-column row-group pruning and the
    * exact intersects refine: file-level footer prune → pushed bbox
    * range filters (row-group skip) → exact `ST_Intersects` against the
    * envelope. Falls back gracefully when the table has no `bbox`
    * column (plain [[readIntersecting]] + exact refine). */
  def readCoveredIntersecting(spark: SparkSession, path: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): DataFrame = {
    val base = readIntersecting(spark, path, xmin, ymin, xmax, ymax)
    val withBox =
      if (base.columns.contains("bbox"))
        base.where(bboxIntersects(xmin, ymin, xmax, ymax))
      else base
    firstMeta(spark, path) match {
      case Some(m) if withBox.columns.contains(m.primaryColumn) &&
          withBox.schema(m.primaryColumn).dataType ==
            org.apache.spark.sql.types.BinaryType =>
        withBox.where(GeoFunctions.st_intersects(col(m.primaryColumn),
          GeoFunctions.st_makeenvelope(lit(xmin), lit(ymin), lit(xmax), lit(ymax))))
      case _ => withBox
    }
  }

  private def writeImpl(df: DataFrame, path: String, geomCol: String,
      srid: Int, mode: String, covering: Boolean, cluster: Boolean,
      blockSize: Option[Long]): Unit = {
    val spark = df.sparkSession
    GeoFunctions.register(spark)
    val asWkb = df.withColumn(geomCol, GeoFunctions.st_asbinary(col(geomCol)))
    val prepared =
      if (!covering) asWkb
      else {
        val bb = GeoFunctions.box2d(GeoFunctions.st_geomfromwkb(col(geomCol)))
        val withBox = asWkb.withColumn("__bb", bb)
          .withColumn("bbox", struct(col("__bb.xmin").as("xmin"),
            col("__bb.ymin").as("ymin"), col("__bb.xmax").as("xmax"),
            col("__bb.ymax").as("ymax")))
          .drop("__bb")
        if (!cluster) withBox
        else {
          // spatial clustering key: geohash of the bbox center — Morton
          // (Z-order) locality in base32, so range-partitioned +
          // locally-sorted rows give every row group a tight bbox
          val ctr = GeoFunctions.st_geohash(
            GeoFunctions.st_point(
              (col("bbox.xmin") + col("bbox.xmax")) / 2,
              (col("bbox.ymin") + col("bbox.ymax")) / 2), lit(9))
          withBox.withColumn("__gh", ctr)
            .repartitionByRange(col("__gh"))
            .sortWithinPartitions("__gh")
            .drop("__gh")
        }
      }
    val writer0 = prepared.write.mode(mode)
    val writer = blockSize.fold(writer0)(b =>
      writer0.option("parquet.block.size", b.toString))
    writer.parquet(path)
    // one stats job over the written files: per-file bbox + geometry
    // types (same shape as GeoTable's sidecar aggregation)
    val g = GeoFunctions.st_geomfromwkb(col(geomCol))
    val bb = GeoFunctions.box2d(g)
    val typ = GeoFunctions.st_geometrytype(g)
    val stats = spark.read.parquet(path)
      .select(input_file_name().as("file"), bb.as("bb"), typ.as("t"))
      .groupBy("file")
      .agg(min(col("bb.xmin")).as("xmin"), min(col("bb.ymin")).as("ymin"),
        max(col("bb.xmax")).as("xmax"), max(col("bb.ymax")).as("ymax"),
        collect_set(col("t")).as("types"))
      .collect()
      .map { r =>
        val types = r.getSeq[String](5)
          // engine names are PostGIS-style ST_Point; the spec wants Point
          .map(t => t.stripPrefix("ST_")).sorted
        r.getString(0) -> ((r.get(1), r.get(2), r.get(3), r.get(4), types))
      }.toMap
    val confMap = hadoopConfAsMap(spark)
    val entries = stats.toSeq.map { case (file, (x0, y0, x1, y1, types)) =>
      (file, geoJson(geomCol, srid, covering,
        Option(x0).map(_.asInstanceOf[Double]), Option(y0).map(_.asInstanceOf[Double]),
        Option(x1).map(_.asInstanceOf[Double]), Option(y1).map(_.asInstanceOf[Double]),
        types))
    }
    // distributed footer rewrite: one task per file
    spark.sparkContext.parallelize(entries, math.max(1, math.min(entries.size, 64)))
      .foreach { case (file, json) =>
        injectFooterKv(new Path(new java.net.URI(file)), confOf(confMap), GeoKey, json)
      }
  }

  /** The parsed `geo` metadata of one file (footer-only read). */
  case class GeoFileMeta(primaryColumn: String, encoding: String,
      srid: Int, bbox: Option[(Double, Double, Double, Double)])

  /** Footer `geo` metadata of every data file under `path`. Files
    * without a parseable `geo` key map to None. */
  def fileMeta(spark: SparkSession, path: String): Seq[(String, Option[GeoFileMeta])] = {
    val conf = spark.sessionState.newHadoopConf()
    dataFiles(conf, new Path(path)).map(f => (f.toString, readGeoMeta(conf, f)))
  }

  /** Read a GeoParquet table: WKB primary column re-tagged into engine
    * geometry (SRID from the metadata crs; the spec's absent/null crs =
    * OGC:CRS84 → 4326). Files lacking `geo` metadata read as plain
    * parquet (the column stays binary WKB) rather than failing. */
  def read(spark: SparkSession, path: String): DataFrame = {
    GeoFunctions.register(spark)
    val df = spark.read.parquet(path)
    firstMeta(spark, path) match {
      // only the WKB encoding is decodable here; GeoParquet 1.1 native
      // (geoarrow) columns pass through untouched rather than mis-tagging
      case Some(m) if m.encoding == "WKB" && df.columns.contains(m.primaryColumn) =>
        df.withColumn(m.primaryColumn,
          GeoFunctions.st_geomfromwkb(col(m.primaryColumn), lit(m.srid)))
      case _ => df
    }
  }

  /** Read only the files whose per-file `geo` bbox intersects the query
    * envelope. A file with missing/malformed metadata or no bbox is
    * always read (never silently dropped). */
  def readIntersecting(spark: SparkSession, path: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): DataFrame = {
    GeoFunctions.register(spark)
    val metas = fileMeta(spark, path)
    val keep = metas.collect {
      case (f, None) => f
      case (f, Some(m)) if m.bbox.forall { case (x0, y0, x1, y1) =>
        x0 <= xmax && x1 >= xmin && y0 <= ymax && y1 >= ymin } => f
    }
    val base =
      if (keep.isEmpty) spark.read.parquet(path).limit(0) // schema, no data
      else spark.read.parquet(keep: _*)
    metas.collectFirst { case (_, Some(m)) => m } match {
      case Some(m) if m.encoding == "WKB" && base.columns.contains(m.primaryColumn) =>
        base.withColumn(m.primaryColumn,
          GeoFunctions.st_geomfromwkb(col(m.primaryColumn), lit(m.srid)))
      case _ => base
    }
  }

  /** (files read, files total) for an envelope — observability twin of
    * GeoTable.pruningStats, off foreign-readable metadata. */
  def pruningStats(spark: SparkSession, path: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): (Int, Int) = {
    val metas = fileMeta(spark, path)
    val hit = metas.count {
      case (_, None) => true
      case (_, Some(m)) => m.bbox.forall { case (x0, y0, x1, y1) =>
        x0 <= xmax && x1 >= xmin && y0 <= ymax && y1 >= ymin }
    }
    (hit, metas.size)
  }

  // ---- metadata JSON ------------------------------------------------------

  private def geoJson(geomCol: String, srid: Int, covering: Boolean,
      xmin: Option[Double], ymin: Option[Double],
      xmax: Option[Double], ymax: Option[Double], types: Seq[String]): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    // the covering object is a 1.1 feature; plain writes stay 1.0.0
    root.put("version", if (covering) "1.1.0" else "1.0.0")
    root.put("primary_column", geomCol)
    val cols = root.putObject("columns")
    val c = cols.putObject(geomCol)
    c.put("encoding", "WKB")
    if (covering) {
      // GeoParquet 1.1 "covering": path of each bbox struct field
      val cov = c.putObject("covering").putObject("bbox")
      Seq("xmin", "ymin", "xmax", "ymax").foreach { f =>
        val a = cov.putArray(f); a.add("bbox"); a.add(f)
      }
    }
    val ts = c.putArray("geometry_types")
    types.foreach(ts.add)
    if (srid == 4326 || srid == 0) c.putNull("crs") // spec default OGC:CRS84
    else {
      val crs = c.putObject("crs")
      crs.put("type", "GeographicCRS")
      crs.put("name", s"EPSG:$srid")
      val id = crs.putObject("id")
      id.put("authority", "EPSG")
      id.put("code", srid)
    }
    (xmin, ymin, xmax, ymax) match {
      case (Some(x0), Some(y0), Some(x1), Some(y1)) =>
        val bb = c.putArray("bbox")
        bb.add(x0); bb.add(y0); bb.add(x1); bb.add(y1)
      case _ => () // all-empty-geometry file: bbox omitted (spec: optional)
    }
    m.writeValueAsString(root)
  }

  private def parseGeoJsonMeta(json: String): Option[GeoFileMeta] =
    try {
      val root = new ObjectMapper().readTree(json)
      val primary = root.path("primary_column").asText("")
      val colNode = root.path("columns").path(primary)
      if (primary.isEmpty || colNode.isMissingNode) None
      else {
        val enc = colNode.path("encoding").asText("")
        val crs = colNode.path("crs")
        val srid =
          if (crs.isMissingNode || crs.isNull) 4326 // OGC:CRS84 default
          else {
            val code = crs.path("id").path("code")
            if (code.isNumber &&
                crs.path("id").path("authority").asText("") == "EPSG") code.asInt()
            else 0 // unknown authority: keep geometry, no SRID claim
          }
        val bn = colNode.path("bbox")
        val bbox =
          if (bn.isArray && bn.size() >= 4)
            Some((bn.get(0).asDouble(), bn.get(1).asDouble(),
              bn.get(2).asDouble(), bn.get(3).asDouble()))
          else None
        Some(GeoFileMeta(primary, enc, srid, bbox))
      }
    } catch { case _: Exception => None }

  // ---- footer plumbing ----------------------------------------------------

  private def firstMeta(spark: SparkSession, path: String): Option[GeoFileMeta] = {
    val conf = spark.sessionState.newHadoopConf()
    dataFiles(conf, new Path(path)).iterator.flatMap(f => readGeoMeta(conf, f))
      .nextOption()
  }

  private def dataFiles(conf: Configuration, root: Path): Seq[Path] = {
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    val out = collection.mutable.ArrayBuffer.empty[Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        out += s.getPath
    }
    out.toSeq.sortBy(_.toString)
  }

  private def readGeoMeta(conf: Configuration, file: Path): Option[GeoFileMeta] =
    try {
      val reader = org.apache.parquet.hadoop.ParquetFileReader
        .open(HadoopInputFile.fromPath(file, conf))
      try Option(reader.getFooter.getFileMetaData.getKeyValueMetaData.get(GeoKey))
        .flatMap(parseGeoJsonMeta)
      finally reader.close()
    } catch { case _: Exception => None }

  /** Rewrite one parquet file's footer with `key -> json` added to its
    * key-value metadata. Streams the data section (everything before
    * the footer) unchanged into a sibling temp file, serializes the
    * augmented footer, renames over the original. Block/column-index
    * offsets point into the untouched data section, so the rewritten
    * file is byte-valid for any parquet reader. */
  private def injectFooterKv(file: Path, conf: Configuration,
      key: String, json: String): Unit = {
    val fs = file.getFileSystem(conf)
    val len = fs.getFileStatus(file).getLen
    // trailing 8 bytes: 4-byte little-endian footer length + "PAR1"
    val footer = {
      val reader = org.apache.parquet.hadoop.ParquetFileReader
        .open(HadoopInputFile.fromPath(file, conf))
      try reader.getFooter finally reader.close()
    }
    val tail = new Array[Byte](8)
    val in0 = fs.open(file)
    try { in0.readFully(len - 8, tail) } finally in0.close()
    require(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1',
      s"$file is not a parquet file (bad magic)")
    val footerLen = java.nio.ByteBuffer.wrap(tail, 0, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val dataEnd = len - 8 - footerLen
    val old = footer.getFileMetaData
    val kv = new java.util.HashMap[String, String](old.getKeyValueMetaData)
    kv.put(key, json)
    val augmented = new ParquetMetadata(
      new FileMetaData(old.getSchema, kv, old.getCreatedBy), footer.getBlocks)
    val tmp = new Path(file.getParent, s".${file.getName}.geotmp")
    val in = fs.open(file)
    val out = fs.create(tmp, true)
    try {
      val buf = new Array[Byte](1 << 20)
      var remaining = dataEnd
      while (remaining > 0) {
        val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
        require(n > 0, s"unexpected EOF copying $file")
        out.write(buf, 0, n)
        remaining -= n
      }
      val thrift = new ParquetMetadataConverter()
        .toParquetMetadata(ParquetFileWriter.CURRENT_VERSION, augmented)
      val footerStart = out.getPos
      org.apache.parquet.format.Util.writeFileMetaData(thrift, out)
      val newFooterLen = (out.getPos - footerStart).toInt
      out.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(newFooterLen).array())
      out.write("PAR1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    } finally {
      in.close()
      out.close()
    }
    if (!fs.rename(tmp, file)) {
      // HDFS-style rename refuses to clobber: delete then rename
      fs.delete(file, false)
      require(fs.rename(tmp, file), s"could not replace $file with rewritten footer")
    }
  }

  // Hadoop Configuration is not serializable; ship it to footer-rewrite
  // tasks as a plain property map (public API only)
  private def hadoopConfAsMap(spark: SparkSession): Array[(String, String)] = {
    val c = spark.sessionState.newHadoopConf()
    val it = c.iterator()
    val out = collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); out += (e.getKey -> e.getValue) }
    out.toArray
  }

  private def confOf(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
