package graft

import graft.functions.GeoFunctions
import graft.operators.SpatialJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SpatialJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixtures() = {
    GeoFunctions.register(spark)
    val pts = spark.sql("""
      SELECT id, ST_GeomFromText('POINT(' || CAST(id AS STRING) || ' ' || CAST(id AS STRING) || ')') AS geom
      FROM range(0, 50) t(id)""")
    // two overlapping boxes + one far away
    val boxes = spark.sql("""
      SELECT * FROM VALUES
        (100, ST_MakeEnvelope(0.0, 0.0, 10.0, 10.0)),
        (200, ST_MakeEnvelope(5.0, 5.0, 20.0, 20.0)),
        (300, ST_MakeEnvelope(1000.0, 1000.0, 1001.0, 1001.0)) AS t(bid, bgeom)""")
    (pts, boxes)
  }

  // brute-force truth: diagonal point (i,i) hits box iff i in [lo, hi]
  private val expected: Set[(Long, Int)] =
    ((0L to 10L).map(_ -> 100) ++ (5L to 20L).map(_ -> 200)).toSet

  test("broadcast STRtree join matches brute force") {
    val (pts, boxes) = fixtures()
    val got = SpatialJoin.broadcastJoin(pts, "geom", boxes, "bgeom")
      .select("id", "bid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expected)
  }

  test("grid-partitioned join matches brute force across cell sizes, full rows, no dups") {
    val (pts, boxes) = fixtures()
    for (cell <- Seq(3.0, 10.0, 100.0)) {
      val out = SpatialJoin.gridJoin(pts, "geom", boxes, "bgeom", cellSize = cell)
      // full rows from both sides flow through (anchor-cell dedup, no distinct)
      assert(out.columns.toSeq == Seq("id", "geom", "bid", "bgeom"))
      val rows = out.collect().map(r => (r.getLong(0), r.getInt(2)))
      assert(rows.length == rows.distinct.length, s"cellSize=$cell produced duplicate pairs")
      assert(rows.toSet == expected, s"cellSize=$cell")
    }
    assert(!SpatialJoin.gridJoin(pts, "geom", boxes, "bgeom", cellSize = 3.0)
      .queryExecution.executedPlan.toString.contains("Deduplicate"))
  }

  test("gridJoin rejects overlapping column names with a clear error") {
    GeoFunctions.register(spark)
    val a = spark.sql("""
      SELECT id, ST_GeomFromText('POINT(' || CAST(id AS STRING) || ' 0)') AS geom
      FROM range(0, 10) t(id)""")
    val b = spark.sql("""
      SELECT id + 100 AS bid, ST_MakeEnvelope(CAST(id AS DOUBLE), -1.0, CAST(id + 2 AS DOUBLE), 1.0) AS geom
      FROM range(0, 5) t(id)""")
    val e = intercept[IllegalArgumentException](
      SpatialJoin.gridJoin(a, "geom", b, "geom", cellSize = 2.0))
    assert(e.getMessage.contains("geom"))
    val got = SpatialJoin.gridJoin(a, "geom", b.withColumnRenamed("geom", "bgeom"), "bgeom",
        cellSize = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val expected = (for { i <- 0L until 10L; j <- 0L until 5L if i >= j && i <= j + 2 }
      yield (i, j + 100)).toSet
    assert(got == expected)
  }

  test("st_x/st_y of an empty geometry are NULL, not a crash") {
    GeoFunctions.register(spark)
    val r = spark.sql(
      "SELECT ST_X(ST_GeomFromText('POINT EMPTY')) AS x, ST_Y(ST_GeomFromText('POINT EMPTY')) AS y")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("knn join returns exact nearest neighbors in rank order") {
    GeoFunctions.register(spark)
    // queries at x = 0, 50; corpus points at x = 3, 4, 10, 47, 60 (tie-free)
    val q = spark.sql("""
      SELECT qid, ST_GeomFromText('POINT(' || CAST(x AS STRING) || ' 0)') AS qgeom
      FROM VALUES (1, 0), (2, 50) AS t(qid, x)""")
    val c = spark.sql("""
      SELECT cid, ST_GeomFromText('POINT(' || CAST(x AS STRING) || ' 0)') AS cgeom
      FROM VALUES (10, 3), (20, 4), (30, 10), (40, 47), (50, 60) AS t(cid, x)""")
    val got = SpatialJoin.knnJoin(q, "qgeom", c, "cgeom", k = 2)
      .select("qid", "cid", "knn_rank", "knn_distance").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == Set(
      (1, 10, 1, 3.0), (1, 20, 2, 4.0),
      (2, 40, 1, 3.0), (2, 50, 2, 10.0)))
  }

  test("knn join is exact for large-extent geometries (true-distance branch-and-bound)") {
    GeoFunctions.register(spark)
    // Decoys: L-shaped linestrings whose ENVELOPES contain the query point
    // (envelope distance 0) but whose true distance is 100. The real
    // nearest neighbors are points at distances 60 and 70. An
    // envelope-ranked over-fetch would drown in decoys; the true-geometry
    // ItemDistance must rank the points first.
    val q = spark.sql(
      "SELECT 1 AS qid, ST_GeomFromText('POINT(0 0)') AS qgeom")
    val c = spark.sql("""
      SELECT cid, ST_GeomFromText(wkt) AS cgeom FROM VALUES
        (1, 'POINT(60 0)'), (2, 'POINT(0 70)'),
        (10, 'LINESTRING(-100 -100, -100 100, 100 100)'),
        (11, 'LINESTRING(-101 -101, -101 101, 101 101)'),
        (12, 'LINESTRING(-102 -102, -102 102, 102 102)'),
        (13, 'LINESTRING(-103 -103, -103 103, 103 103)'),
        (14, 'LINESTRING(-104 -104, -104 104, 104 104)'),
        (15, 'LINESTRING(-105 -105, -105 105, 105 105)') AS t(cid, wkt)""")
    val got = SpatialJoin.knnJoin(q, "qgeom", c, "cgeom", k = 2)
      .select("cid", "knn_rank", "knn_distance").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == Set((1, 1, 60.0), (2, 2, 70.0)))
  }

  test("knnJoinBroadcastQueries agrees with knnJoin (small fixtures, big-corpus shape)") {
    GeoFunctions.register(spark)
    val q = spark.sql("""
      SELECT qid, ST_GeomFromText('POINT(' || CAST(x AS STRING) || ' 0)') AS qgeom
      FROM VALUES (1, 0), (2, 50), (3, 17) AS t(qid, x)""")
    // 200 corpus points across 4 partitions, distances tie-free
    val c = spark.sql("""
      SELECT id AS cid, ST_GeomFromText('POINT(' || CAST(id * 7 % 101 AS STRING) ||
        ' ' || CAST(id % 3 AS STRING) || ')') AS cgeom
      FROM range(0, 200) t(id)""").repartition(4)
    // both are exact, but tie-break POLICIES differ (build index vs
    // content hash), so the invariant is the per-rank distance sequence
    def run(f: => org.apache.spark.sql.DataFrame): Seq[(Int, Int, Double)] =
      f.select("qid", "knn_rank", "knn_distance").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
    val viaBroadcastRight = run(SpatialJoin.knnJoin(q, "qgeom", c, "cgeom", k = 4))
    val viaBroadcastQueries =
      run(SpatialJoin.knnJoinBroadcastQueries(q, "qgeom", c, "cgeom", k = 4))
    assert(viaBroadcastQueries == viaBroadcastRight && viaBroadcastRight.size == 12)
    // and the distributed variant is itself run-to-run deterministic
    val again = run(SpatialJoin.knnJoinBroadcastQueries(q, "qgeom", c, "cgeom", k = 4))
    assert(again == viaBroadcastQueries)
  }

  test("covers / coveredby predicates refine correctly") {
    val (pts, boxes) = fixtures()
    // box covers point — boundary points count as covered
    val cov = SpatialJoin.broadcastJoin(boxes, "bgeom", pts.limit(12), "geom", "covers")
      .select("bid", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(cov == ((0L to 10L).map(100 -> _) ++ (5L to 11L).map(200 -> _)).toSet)
  }

  test("clusterWithin: single-linkage chains merge, isolated points stay singletons") {
    import spark.implicits._
    import graft.functions.GeoFunctions._
    import org.apache.spark.sql.functions._
    // chain 0-1-2 at spacing 1 (0 and 2 are 2 apart but link through 1),
    // pair 10-11 at spacing 1, singleton 20 far away
    val pts = Seq(
      (0L, 0.0, 0.0), (1L, 1.0, 0.0), (2L, 2.0, 0.0),
      (10L, 50.0, 50.0), (11L, 50.8, 50.0),
      (20L, 200.0, 200.0)).toDF("id", "x", "y")
      .select(col("id"), st_geomfromtext(
        concat(lit("POINT("), col("x"), lit(" "), col("y"), lit(")"))).as("g"))
    val got = graft.operators.SpatialCluster.clusterWithin(pts, "id", "g", dist = 1.2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("st_subdivide is join-transparent: parts match the same rows as the whole") {
    GeoFunctions.register(spark)
    // a 301-vertex polygon (segmentized 100x50 rect) is the oversized-
    // geometry shape that hot-spots every grid cell it covers; the
    // pre-join lever is explode(ST_Subdivide(...)) + DISTINCT on the
    // probe id. Parts cover the input exactly, so the match set is
    // IDENTICAL — including points sitting on internal cut lines, which
    // intersect two parts and dedup away.
    val pts = spark.sql("""
      SELECT id, ST_GeomFromText('POINT(' || CAST(id % 120 AS STRING) || ' '
               || CAST(id % 60 AS STRING) || ')') AS geom
      FROM range(0, 200) t(id)""")
    val whole = spark.sql("""
      SELECT 1 AS bid,
             ST_Segmentize(ST_MakeEnvelope(0D, 0D, 100D, 50D), 1.0D) AS bgeom""")
    val parts = spark.sql("""
      SELECT 1 AS bid, part AS bgeom FROM (
        SELECT explode(ST_Subdivide(
          ST_Segmentize(ST_MakeEnvelope(0D, 0D, 100D, 50D), 1.0D), 16)) AS part)""")
    assert(parts.count() >= 2)
    def ids(right: org.apache.spark.sql.DataFrame): Set[Long] =
      SpatialJoin.broadcastJoin(pts, "geom", right, "bgeom")
        .select("id").distinct().collect().map(_.getLong(0)).toSet
    val viaWhole = ids(whole)
    assert(viaWhole.nonEmpty && ids(parts) == viaWhole)
  }

  test("clusterIntersecting: overlap chains merge, touching counts, disjoint stays solo") {
    import spark.implicits._
    import graft.functions.GeoFunctions._
    import org.apache.spark.sql.functions._
    // 0-1 overlap, 1-2 overlap (chain); 10 touches 11 at a shared edge
    // (ST_Intersects = true for boundary contact); 20 disjoint
    val rows = Seq(
      (0L, 0.0, 0.0, 2.0, 1.0), (1L, 1.5, 0.0, 3.5, 1.0), (2L, 3.0, 0.0, 5.0, 1.0),
      (10L, 50.0, 0.0, 51.0, 1.0), (11L, 51.0, 0.0, 52.0, 1.0),
      (20L, 200.0, 0.0, 201.0, 1.0)).toDF("id", "x0", "y0", "x1", "y1")
      .select(col("id"), st_makeenvelope(col("x0"), col("y0"), col("x1"), col("y1")).as("g"))
    val got = graft.operators.SpatialCluster
      .clusterIntersecting(rows, "id", "g", cellSize = 2.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("dbscan: cores chain, borders attach to min cluster, sparse points are noise") {
    import spark.implicits._
    import graft.functions.GeoFunctions._
    import org.apache.spark.sql.functions._
    // dense run 0..4 at spacing 1 (eps=1.2, minPts=3 → 1..3 have 2+
    // neighbors = core; 0 and 4 are borders); isolated pair 10,11 has
    // only 1 neighbor each → no cores → both noise; 20 alone → noise
    val pts = Seq(
      (0L, 0.0), (1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0),
      (10L, 50.0), (11L, 51.0),
      (20L, 100.0)).toDF("id", "x")
      .select(col("id"), st_geomfromtext(
        concat(lit("POINT("), col("x"), lit(" 0)"))).as("g"))
    val got = graft.operators.SpatialCluster.dbscan(pts, "id", "g", eps = 1.2, minPts = 3)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(
      0L -> Some(1L), 1L -> Some(1L), 2L -> Some(1L), 3L -> Some(1L), 4L -> Some(1L),
      10L -> None, 11L -> None, 20L -> None))
  }

  test("dbscan minPts=1: every point is core; isolated points are singleton clusters") {
    import spark.implicits._
    import graft.functions.GeoFunctions._
    import org.apache.spark.sql.functions._
    // PostGIS ST_ClusterDBSCAN(minpoints := 1): degree >= 0 makes every
    // point core, so the result is the eps-connected components and an
    // isolated point (20) gets its OWN cluster id, never noise
    val pts = Seq(
      (0L, 0.0), (1L, 1.0), (2L, 2.0),
      (10L, 50.0), (11L, 51.0),
      (20L, 100.0)).toDF("id", "x")
      .select(col("id"), st_geomfromtext(
        concat(lit("POINT("), col("x"), lit(" 0)"))).as("g"))
    val got = graft.operators.SpatialCluster.dbscan(pts, "id", "g", eps = 1.2, minPts = 1)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(
      0L -> Some(0L), 1L -> Some(0L), 2L -> Some(0L),
      10L -> Some(10L), 11L -> Some(10L), 20L -> Some(20L)))
  }

  test("clusterKMeans: Lloyd converges to the two obvious groups; ties break low") {
    import spark.implicits._
    import graft.functions.GeoFunctions._
    import org.apache.spark.sql.functions._
    // seeds = centroids of the 2 lowest ids: (0,0) and (1,0). After one
    // Lloyd step the centers move to (0,0) and (22/3,0); after the second
    // they are (0.5,0) and (10.5,0) — the natural left/right split.
    val pts = Seq(
      (0L, 0.0), (1L, 1.0), (10L, 10.0), (11L, 11.0)).toDF("id", "x")
      .select(col("id"), st_geomfromtext(
        concat(lit("POINT("), col("x"), lit(" 0)"))).as("g"))
    val got = graft.operators.SpatialCluster.clusterKMeans(pts, "id", "g", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 0, 10L -> 1, 11L -> 1))

    // iters=0 assigns against the raw seeds; (1,0) is EXACTLY equidistant
    // from seeds (0,0) and (2,0) and must take the lower cluster index.
    // Rect input exercises the PostGIS centroid-of-geometry contract:
    // the unit square [9.5,10.5]x[-0.5,0.5] has centroid (10,0) -> seed 1.
    val mixed = Seq(
      (0L, "POINT(0 0)"), (5L, "POINT(2 0)"), (7L, "POINT(1 0)"),
      (9L, "POLYGON((9.5 -0.5,10.5 -0.5,10.5 0.5,9.5 0.5,9.5 -0.5))"))
      .toDF("id", "wkt")
      .select(col("id"), st_geomfromtext(col("wkt")).as("g"))
    val got0 = graft.operators.SpatialCluster.clusterKMeans(mixed, "id", "g", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got0 == Map(0L -> 0, 5L -> 1, 7L -> 0, 9L -> 1))
  }

  test("clusterKMeans: null/empty geometries fail fast with a clear error") {
    import spark.implicits._
    import graft.functions.GeoFunctions._
    import org.apache.spark.sql.functions._
    val withEmpty = Seq(
      (0L, "POINT(0 0)"), (1L, "POINT EMPTY"), (2L, "POINT(1 0)"))
      .toDF("id", "wkt")
      .select(col("id"), st_geomfromtext(col("wkt")).as("g"))
    val ex = intercept[Exception] {
      graft.operators.SpatialCluster.clusterKMeans(withEmpty, "id", "g", k = 2)
    }
    assert(ex.getMessage.contains("null/empty geometries"))
  }
}
