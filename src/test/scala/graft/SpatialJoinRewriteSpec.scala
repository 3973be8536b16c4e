package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SpatialJoinRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  // a session with GraftExtensions installed (functions + optimizer rule)
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("rewrite-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.graft.spatialJoin.cellSize", "10.0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def fixtures(): Unit = {
    spark.sql("""
      SELECT id, ST_GeomFromText('POINT(' || CAST(id % 40 AS STRING) || ' ' || CAST(id % 25 AS STRING) || ')') AS geom
      FROM range(0, 200) t(id)""").createOrReplaceTempView("pts")
    spark.sql("""
      SELECT * FROM VALUES
        (100, ST_MakeEnvelope(0.0, 0.0, 10.0, 10.0)),
        (200, ST_MakeEnvelope(5.0, 5.0, 30.0, 30.0)),
        (300, ST_MakeEnvelope(1000.0, 1000.0, 1001.0, 1001.0)) AS t(bid, bgeom)""")
      .createOrReplaceTempView("boxes")
  }

  private val joinSql = """
    SELECT id, bid FROM pts JOIN boxes ON ST_Intersects(geom, bgeom)"""

  test("small build side: physical BroadcastSpatialJoinExec is planned") {
    fixtures()
    val plan = spark.sql(joinSql).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastSpatialJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("broadcast strategy result equals arithmetic truth, with extra conjuncts") {
    fixtures()
    val got = spark.sql(joinSql).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val expected = (0L until 200L).flatMap { i =>
      val x = i % 40; val y = i % 25
      Seq(100 -> (x <= 10 && y <= 10), 200 -> (x >= 5 && x <= 30 && y >= 5 && y <= 25))
        .collect { case (b, true) => (i, b) }
    }.toSet
    assert(got == expected)
    val filtered = spark.sql("""
      SELECT id, bid FROM pts JOIN boxes ON ST_Intersects(geom, bgeom) AND id % 2 = 0""")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(filtered == expected.filter(_._1 % 2 == 0))
  }

  test("big build side: grid rewrite fires instead of broadcast") {
    fixtures()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = spark.sql(joinSql).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("__gcell"), plan)
      val got = spark.sql(joinSql).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val expected = (0L until 200L).flatMap { i =>
        val x = i % 40; val y = i % 25
        Seq(100 -> (x <= 10 && y <= 10), 200 -> (x >= 5 && x <= 30 && y >= 5 && y <= 25))
          .collect { case (b, true) => (i, b) }
      }.toSet
      assert(got == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("rewritten join returns exactly the brute-force result") {
    fixtures()
    val got = spark.sql(joinSql).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val (brutePlan, brute) = try {
      spark.conf.set("spark.graft.spatialJoin.rewrite", "false")
      spark.conf.set("spark.graft.spatialJoin.broadcast", "false")
      (spark.sql(joinSql).queryExecution.executedPlan.toString,
        spark.sql(joinSql).collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
    } finally {
      spark.conf.set("spark.graft.spatialJoin.rewrite", "true")
      spark.conf.set("spark.graft.spatialJoin.broadcast", "true")
    }
    assert(brutePlan.contains("BroadcastNestedLoopJoin"), brutePlan)
    assert(got == brute)
    assert(got.nonEmpty)
    // sanity vs arithmetic truth: point (i%40, i%25) in box iff coords in range
    val expected = (0L until 200L).flatMap { i =>
      val x = i % 40; val y = i % 25
      Seq(100 -> (x <= 10 && y <= 10), 200 -> (x >= 5 && x <= 30 && y >= 5 && y <= 25))
        .collect { case (b, true) => (i, b) }
    }.toSet
    assert(got == expected)
  }

  test("contains-join accelerates through both paths with correct strict semantics") {
    fixtures()
    // boundary points are NOT contained — distinguishes contains from intersects
    val sql = "SELECT id, bid FROM pts JOIN boxes ON ST_Contains(bgeom, geom)"
    val expected = (0L until 200L).flatMap { i =>
      val x = i % 40; val y = i % 25
      Seq(100 -> (x > 0 && x < 10 && y > 0 && y < 10),
        200 -> (x > 5 && x < 30 && y > 5 && y < 25))
        .collect { case (b, true) => (i, b) }
    }.toSet
    // broadcast path
    val p1 = spark.sql(sql).queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastSpatialJoin"), p1)
    assert(spark.sql(sql).collect().map(r => (r.getLong(0), r.getInt(1))).toSet == expected)
    // grid path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p2 = spark.sql(sql).queryExecution.executedPlan.toString
      assert(p2.contains("__gcell"), p2)
      assert(spark.sql(sql).collect().map(r => (r.getLong(0), r.getInt(1))).toSet == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("dwithin-join accelerates with distance-expanded bboxes through both paths") {
    fixtures()
    // distance 3 from each box — bbox overlap alone would miss these pairs
    val sql = "SELECT id, bid FROM pts JOIN boxes ON ST_DWithin(geom, bgeom, 3.0)"
    def dist(x: Long, y: Long, x0: Double, y0: Double, x1: Double, y1: Double): Double = {
      val dx = math.max(0.0, math.max(x0 - x, x - x1))
      val dy = math.max(0.0, math.max(y0 - y, y - y1))
      math.sqrt(dx * dx + dy * dy)
    }
    val expected = (0L until 200L).flatMap { i =>
      val x = i % 40; val y = i % 25
      Seq(100 -> (dist(x, y, 0, 0, 10, 10) <= 3.0),
        200 -> (dist(x, y, 5, 5, 30, 30) <= 3.0))
        .collect { case (b, true) => (i, b) }
    }.toSet
    val p1 = spark.sql(sql).queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastSpatialJoin"), p1)
    assert(spark.sql(sql).collect().map(r => (r.getLong(0), r.getInt(1))).toSet == expected)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p2 = spark.sql(sql).queryExecution.executedPlan.toString
      assert(p2.contains("__gcell"), p2)
      assert(spark.sql(sql).collect().map(r => (r.getLong(0), r.getInt(1))).toSet == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("LEFT OUTER spatial join: unmatched points keep nulls, plan avoids BNLJ") {
    fixtures()
    val sql = """
      SELECT id, bid FROM pts LEFT JOIN boxes ON ST_Intersects(geom, bgeom)
      ORDER BY id, bid"""
    val plan = spark.sql(sql).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastSpatialJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val rows = spark.sql(sql).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    val expected = (0L until 200L).flatMap { i =>
      val x = i % 40; val y = i % 25
      val hits = Seq(100 -> (x <= 10 && y <= 10), 200 -> (x >= 5 && x <= 30 && y >= 5 && y <= 25))
        .collect { case (b, true) => (i, b) }
      if (hits.isEmpty) Seq((i, -1)) else hits
    }.sorted
    assert(rows.toSeq == expected)
    // every left row appears at least once
    assert(rows.map(_._1).distinct.length == 200)
  }

  test("small LEFT side: broadcast spatial join builds on the left, streams the right") {
    fixtures()
    spark.sql("""
      SELECT id, ST_GeomFromText('POINT(' || CAST(id % 40 AS STRING) || ' ' || CAST(id % 25 AS STRING) || ')') AS geom
      FROM range(0, 200000) t(id)""").createOrReplaceTempView("bigpts")
    // threshold small enough that only the 3-row boxes side is buildable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    try {
      val sql = "SELECT id, bid FROM boxes JOIN bigpts ON ST_Intersects(geom, bgeom)"
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastSpatialJoin"), plan)
      assert(!plan.contains("__gcell") && !plan.contains("BroadcastNestedLoopJoin"), plan)
      // the (x, y) = (i % 40, i % 25) pattern repeats every 200 ids
      val cyclePairs = (0L until 200L).flatMap { i =>
        val x = i % 40; val y = i % 25
        Seq(100 -> (x <= 10 && y <= 10), 200 -> (x >= 5 && x <= 30 && y >= 5 && y <= 25))
          .collect { case (b, true) => (i, b) }
      }.size
      assert(spark.sql(sql).count() == 1000L * cyclePairs)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("equi-join conjunct makes spatial planning stand down to a hash join") {
    fixtures()
    spark.sql("SELECT id AS pid, geom, CAST(id % 3 AS INT) AS grp FROM pts")
      .createOrReplaceTempView("pts2")
    spark.sql("SELECT bid, bgeom, CAST(bid % 3 AS INT) AS grp FROM boxes")
      .createOrReplaceTempView("boxes2")
    val sql = """
      SELECT pid, bid FROM pts2 JOIN boxes2
      ON pts2.grp = boxes2.grp AND ST_Intersects(geom, bgeom)"""
    val plan = spark.sql(sql).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastSpatialJoin") && !plan.contains("__gcell"), plan)
    // and it still returns the right rows
    val got = spark.sql(sql).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val expected = (0L until 200L).flatMap { i =>
      val x = i % 40; val y = i % 25
      Seq(100 -> (x <= 10 && y <= 10), 200 -> (x >= 5 && x <= 30 && y >= 5 && y <= 25))
        .collect { case (b, true) if (i % 3) == (b % 3) => (i, b) }
    }.toSet
    assert(got == expected)
  }

  test("rewrite keeps extra join conjuncts") {
    fixtures()
    val got = spark.sql("""
      SELECT id, bid FROM pts JOIN boxes
      ON ST_Intersects(geom, bgeom) AND id % 2 = 0 AND bid = 100""")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got.nonEmpty)
    assert(got.forall { case (i, b) => i % 2 == 0 && b == 100 })
  }

  test("extension-only session runs both UDAFs — no register() call anywhere") {
    // this suite's session is configured ONLY with spark.sql.extensions;
    // st_extent (DeclarativeAggregate) and st_collect (Aggregator via the
    // ScalaAggregator shim) must resolve like built-in aggregates
    fixtures()
    val ext = spark.sql("""
      SELECT st_extent(geom) AS ext FROM pts""").head().getStruct(0)
    assert(ext.getDouble(0) == 0.0 && ext.getDouble(1) == 0.0 &&
      ext.getDouble(2) == 39.0 && ext.getDouble(3) == 24.0)
    val coll = spark.sql("""
      SELECT ST_NumGeometries(st_collect(geom)) AS n,
             ST_GeometryType(st_collect(geom)) AS t
      FROM pts""").head()
    assert(coll.getInt(0) == 200 && coll.getString(1) == "ST_GeometryCollection")
    // grouped + partial-aggregate path (two-phase across the shuffle)
    val grouped = spark.sql("""
      SELECT id % 4 AS g, ST_NumGeometries(st_collect(geom)) AS n
      FROM pts GROUP BY id % 4""").collect()
    assert(grouped.length == 4 && grouped.forall(_.getInt(1) == 50))
  }
}
