package graft

import graft.operators.Tiles
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Tile pyramid: coverage fan-out counts, world-edge clamping, the
  * in-tile MVT coordinate range, and the boundary-ownership law. */
class TilesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val E = 20037508.342789244

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("tiles-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GeoFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def geoms(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toSeq.toDF("id", "wkt")
      .selectExpr("id", "ST_SetSRID(ST_GeomFromText(wkt), 3857) AS g")
  }

  test("envelope spanning the center fans out to all four z=1 tiles") {
    val df = geoms((1L, "POLYGON((-1000000 -1000000,1000000 -1000000," +
      "1000000 1000000,-1000000 1000000,-1000000 -1000000))"))
    val out = Tiles.tilePyramid(df, "id", "g", 1, 1)
      .select("z", "x", "y").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((1, 0L, 0L), (1, 0L, 1L), (1, 1L, 0L), (1, 1L, 1L)))
  }

  test("a point lands in exactly one tile per zoom; pyramid count = zooms") {
    val df = geoms((1L, "POINT(1000000 2000000)"))
    val out = Tiles.tilePyramid(df, "id", "g", 0, 6).collect()
    assert(out.length == 7)
    assert(out.map(_.getInt(1)).toSeq.sorted == (0 to 6))
  }

  test("world-corner envelope clamps to valid tile range") {
    val big = geoms((1L, s"POLYGON((-30000000 -30000000,-19000000 -30000000," +
      "-19000000 -19000000,-30000000 -19000000,-30000000 -30000000))"))
    val out = Tiles.tilePyramid(big, "id", "g", 2, 2)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1)))
    // bottom-left world corner at z=2 → tile (0, 3) only, never negative
    assert(out.toSet == Set((0L, 3L)))
  }

  test("MVT coordinates of contained points land inside the 4096 grid, Y flipped") {
    // center of tile (0,0) at z=1: mercator (-E/2, +E/2)
    val df = geoms((1L, s"POINT(${-E / 2} ${E / 2})"))
    val r = Tiles.tilePyramid(df, "id", "g", 1, 1)
      .selectExpr("ST_X(mvt_geom) AS mx", "ST_Y(mvt_geom) AS my").head()
    assert(math.abs(r.getDouble(0) - 2048.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 2048.0) < 1e-9)
    // a point ABOVE center maps to SMALLER my (the Y flip)
    val up = geoms((1L, s"POINT(${-E / 2} ${E * 0.75})"))
    val r2 = Tiles.tilePyramid(up, "id", "g", 1, 1)
      .selectExpr("ST_Y(mvt_geom) AS my").head()
    assert(r2.getDouble(0) < 2048.0)
  }

  test("tile-edge coordinate belongs to the tile on its right AND emits the left touch") {
    // x = 0 is the z=1 column boundary: envelope degenerate point ON it
    val df = geoms((1L, "POINT(0 1000000)"))
    val out = Tiles.tilePyramid(df, "id", "g", 1, 1)
      .select("x").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L), "floor law: boundary owns rightward")
  }

  test("zoom bounds validated") {
    intercept[IllegalArgumentException] {
      Tiles.tilePyramid(geoms((1L, "POINT(0 0)")), "id", "g", 3, 2)
    }
  }
}
