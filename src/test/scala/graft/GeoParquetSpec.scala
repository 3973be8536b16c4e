package graft

import graft.sources.GeoParquet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GeoParquetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def pointsDf(n: Int) = {
    graft.functions.GeoFunctions.register(spark)
    spark.sql(s"""
      SELECT id,
             ST_GeomFromText('POINT(' || CAST(id % 50 AS STRING) || ' '
               || CAST(id % 7 AS STRING) || ')') AS geom
      FROM range(0, $n) t(id)""")
  }

  test("GeoParquet write stamps spec metadata; read round-trips geometry + srid") {
    val dir = tmp("graft_gpq_rt_")
    GeoParquet.write(pointsDf(500), dir, "geom")
    // every data file carries parseable spec metadata
    val metas = GeoParquet.fileMeta(spark, dir)
    assert(metas.nonEmpty && metas.forall(_._2.isDefined))
    for ((_, Some(m)) <- metas) {
      assert(m.primaryColumn == "geom")
      assert(m.encoding == "WKB")
      assert(m.srid == 4326) // null crs = OGC:CRS84 default
      val (x0, y0, x1, y1) = m.bbox.get
      assert(x0 >= 0 && y0 >= 0 && x1 <= 49 && y1 <= 6)
    }
    // the rewritten files stay byte-valid parquet for a PLAIN reader,
    // and the WKB column is raw (untagged) binary it can consume
    val plain = spark.read.parquet(dir)
    assert(plain.schema("geom").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(plain.count() == 500)
    // GeoParquet.read re-tags into engine geometry with the crs srid
    val back = GeoParquet.read(spark, dir)
    val got = back.selectExpr("id", "ST_AsText(geom)", "ST_SRID(geom)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.length == 500)
    assert(got.forall { case (id, wkt, srid) =>
      wkt == s"POINT(${id % 50} ${id % 7})" && srid == 4326 })
  }

  test("GeoParquet per-file bbox prunes foreign-readable files (behavioral)") {
    val dir = tmp("graft_gpq_prune_")
    // range-partition by x so files carry tight disjoint bboxes
    val df = pointsDf(2000).withColumn("__x",
      expr("ST_X(ST_Centroid(geom))"))
    GeoParquet.write(df.repartitionByRange(8, col("__x")).drop("__x"),
      dir, "geom")
    val (hit, total) = GeoParquet.pruningStats(spark, dir, 0, 0, 5, 6)
    assert(total >= 4, s"expected several files, got $total")
    assert(hit < total, s"envelope should prune some files ($hit/$total)")
    // BEHAVIORAL proof: corrupt every file the envelope does not touch;
    // the pruned read must still succeed — impossible if it listed or
    // read the pruned files
    val metas = GeoParquet.fileMeta(spark, dir)
    val pruned = metas.collect {
      case (f, Some(m)) if !m.bbox.forall { case (x0, y0, x1, y1) =>
        x0 <= 5 && x1 >= 0 && y0 <= 6 && y1 >= 0 } => f
    }
    assert(pruned.nonEmpty)
    // corrupt the DATA PAGES of every pruned file while leaving the
    // leading magic and the footer intact: the footer must stay
    // parseable (a destroyed footer makes fileMeta return None, and the
    // absent-metadata-degrades-to-read policy would deliberately un-prune
    // the file), but any attempt to actually scan the pages now throws
    pruned.foreach { f =>
      val raf = new java.io.RandomAccessFile(
        new java.io.File(new java.net.URI(f)), "rw")
      try {
        raf.seek(4) // keep the 4-byte PAR1 header magic
        raf.write(Array.fill[Byte](64)(0x5a))
      } finally raf.close()
    }
    val rows = GeoParquet.readIntersecting(spark, dir, 0, 0, 5, 6)
      .selectExpr("id", "ST_X(ST_Centroid(geom)) AS x").collect()
    assert(rows.nonEmpty)
    // file-level pruning returns whole files: every envelope row must be
    // present (pruning lost NOTHING), boundary-file rows may ride along,
    // and the pruned files' rows are gone (strictly fewer than all rows)
    val ids = rows.map(_.getLong(0)).toSet
    val expected = (0 until 2000).filter(i => i % 50 <= 5).map(_.toLong).toSet
    assert(expected.subsetOf(ids))
    assert(ids.size < 2000)
  }

  test("GeoParquet read degrades safely without or with malformed metadata") {
    // plain parquet (no geo key): read returns it untouched
    val plainDir = tmp("graft_gpq_plain_")
    pointsDf(20).withColumn("geom",
      graft.functions.GeoFunctions.st_asbinary(col("geom")))
      .write.mode("overwrite").parquet(plainDir)
    val r1 = GeoParquet.read(spark, plainDir)
    assert(r1.schema("geom").dataType == org.apache.spark.sql.types.BinaryType)
    assert(r1.count() == 20)
    // malformed geo JSON: parse returns None, read degrades to plain
    assert(GeoParquet.fileMeta(spark, plainDir).forall(_._2.isEmpty))
  }
}
