package graft

import graft.functions.GeoFunctions
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class UnionAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GeoFunctions.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("st_union_agg dissolves overlaps: 2x2 block from 8 half-offset squares") {
    // two layers of 4 unit squares, the second shifted +0.5 in x so
    // every square overlaps a neighbor; dissolved area is 5.0 (two rows
    // each covering x in [0, 2.5]), far less than the naive sum of 8
    val area = spark.sql("""
      SELECT round(ST_Area(st_union_agg(g)), 6) FROM (
        SELECT ST_MakeEnvelope(CAST(id % 2 AS DOUBLE), CAST(id DIV 2 AS DOUBLE),
                               CAST(id % 2 + 1 AS DOUBLE), CAST(id DIV 2 + 1 AS DOUBLE)) AS g
        FROM range(4)
        UNION ALL
        SELECT ST_MakeEnvelope(CAST(id % 2 AS DOUBLE) + 0.5, CAST(id DIV 2 AS DOUBLE),
                               CAST(id % 2 + 1 AS DOUBLE) + 0.5, CAST(id DIV 2 + 1 AS DOUBLE))
        FROM range(4))""").head().getDouble(0)
    assert(area == 5.0) // each of the two rows covers x in [0, 2.5]
  }

  test("result is partition-invariant in measure; compaction kicks in past 64") {
    import spark.implicits._
    // 300 squares (> 4 compactions' worth) in a 20x15 grid, every cell
    // written twice; dissolved area must be the 300-cell count... cells
    // are distinct over i%300, duplicated by the union of two ranges
    val df = (0 until 600).map { k =>
      val i = k % 300
      (i.toLong, i % 20, i / 20)
    }.toDF("id", "cx", "cy")
    df.createOrReplaceTempView("sq")
    def area(view: String): Double = spark.sql(s"""
      SELECT round(ST_Area(st_union_agg(ST_MakeEnvelope(
        CAST(cx AS DOUBLE), CAST(cy AS DOUBLE),
        CAST(cx + 1 AS DOUBLE), CAST(cy + 1 AS DOUBLE)))), 6) FROM $view""")
      .head().getDouble(0)
    assert(area("sq") == 300.0)
    df.repartition(13).createOrReplaceTempView("sq13")
    assert(area("sq13") == 300.0)
  }

  test("nulls and empties are skipped; empty group is NULL; SRID survives") {
    val r = spark.sql("""
      SELECT ST_SRID(u) AS srid, ST_AsText(u) AS wkt FROM (
        SELECT st_union_agg(g) AS u FROM (
          SELECT ST_SetSRID(ST_GeomFromText('POINT(1 2)'), 4326) AS g
          UNION ALL SELECT NULL
          UNION ALL SELECT ST_GeomFromText('POINT EMPTY')))""").head()
    assert(r.getInt(0) == 4326)
    assert(r.getString(1) == "POINT(1 2)")
    val empty = spark.sql(
      "SELECT st_union_agg(g) FROM (SELECT CAST(NULL AS BINARY) AS g)").head()
    assert(empty.isNullAt(0))
  }

  test("gridDissolve ≡ st_union_agg: area, emptiness, envelope on random boxes") {
    import spark.implicits._
    // 2000 random integer-coordinate rectangles (exact overlay: the
    // union's measure and envelope are order-free), heavy overlaps
    val rnd = new scala.util.Random(42)
    val df = (0 until 2000).map { _ =>
      val x = rnd.nextInt(60); val y = rnd.nextInt(40)
      (x.toDouble, y.toDouble,
        (x + 1 + rnd.nextInt(4)).toDouble, (y + 1 + rnd.nextInt(4)).toDouble)
    }.toDF("x0", "y0", "x1", "y1")
      .selectExpr("ST_MakeEnvelope(x0, y0, x1, y1) AS g")
    val direct = df.selectExpr(
      "round(ST_Area(st_union_agg(g)), 6) AS a",
      "Box2D(st_union_agg(g)) AS b").head()
    // several stagings must all agree with the flat aggregate
    for ((cell, lv, f) <- Seq((4.0, 1, 8), (8.0, 2, 4), (16.0, 3, 2))) {
      val staged = graft.operators.Dissolve.gridDissolve(df, "g", cell, lv, f)
        .selectExpr("round(ST_Area(geom), 6) AS a", "Box2D(geom) AS b").head()
      assert(staged.getDouble(0) == direct.getDouble(0),
        s"area mismatch at cell=$cell levels=$lv")
      assert(staged.getStruct(1) == direct.getStruct(1),
        s"envelope mismatch at cell=$cell levels=$lv")
    }
    // empty input dissolves to a single NULL row
    val empty = graft.operators.Dissolve
      .gridDissolve(df.where("false"), "g", 8.0).head()
    assert(empty.isNullAt(0))
  }

  test("DataFrame column API groups and dissolves per key") {
    import spark.implicits._
    val df = Seq((1, 0.0), (1, 1.0), (1, 1.0), (2, 5.0)).toDF("k", "x")
      .selectExpr("k", "ST_MakeEnvelope(x, 0.0D, x + 1.0D, 1.0D) AS g")
    val out = df.groupBy("k")
      .agg(GeoFunctions.st_union_agg(org.apache.spark.sql.functions.col("g")).as("u"))
      .selectExpr("k", "round(ST_Area(u), 6) AS a")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out == Map(1 -> 2.0, 2 -> 1.0))
  }
}
