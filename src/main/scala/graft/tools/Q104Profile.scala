package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: times each expression family of q104 separately to
  * find where its bench cost concentrates. Delete after use.
  */
object Q104Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("q104profile").getOrCreate()
    graft.functions.GeoFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .createOrReplaceTempView("lineitem")

    val base = """FROM (SELECT l_orderkey, l_linenumber,
                   ST_GeomFromText('POINT(' || CAST(CAST(l_orderkey % 100 AS INT) - 50 AS STRING)
                     || ' ' || CAST(CAST(l_linenumber * 10 AS INT) - 40 AS STRING) || ')', 4326) AS pt
            FROM lineitem)"""

    val variants = Seq(
      "baseline_pt_only" -> s"SELECT l_orderkey, ST_SRID(pt) AS s $base",
      "merc" -> s"SELECT l_orderkey, ST_X(ST_Transform(pt, 3857)) AS x $base",
      "merc_roundtrip" -> s"SELECT l_orderkey, ST_X(ST_Transform(ST_Transform(pt, 3857), 4326)) AS x $base",
      "geohash15_str" -> s"SELECT l_orderkey, length(ST_GeoHash(pt, 15)) AS n $base",
      "gh15_point" -> s"SELECT l_orderkey, ST_X(ST_PointFromGeoHash(ST_GeoHash(pt, 15))) AS x $base",
      "gh4_geom" -> s"SELECT l_orderkey, ST_XMax(ST_GeomFromGeoHash(ST_GeoHash(pt, 4))) AS x $base",
      "gh4_intersects" -> s"SELECT l_orderkey, ST_Intersects(ST_GeomFromGeoHash(ST_GeoHash(pt, 4)), pt) AS b $base",
      "tileenv" -> """SELECT l_orderkey, ST_XMin(ST_TileEnvelope(3, CAST((l_orderkey % 100) % 8 AS INT),
                      CAST(((l_linenumber * 10) / 10) % 8 AS INT))) AS x FROM lineitem"""
    )
    for ((name, sql) <- variants) {
      val df = spark.sql(sql)
      df.write.format("noop").mode("overwrite").save() // warm-up
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q104profile] $name%-20s min=${times.min}%.3f s")
    }
    spark.stop()
  }
}
