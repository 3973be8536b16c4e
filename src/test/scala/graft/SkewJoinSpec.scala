package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("saltedJoin result is identical to the plain join on a skewed key") {
    import spark.implicits._
    // 10k rows, 90% on key 0 — the shape that funnels one reducer
    val probe = (0 until 10000).map(i =>
      (i.toLong, if (i % 10 == 0) (i % 7).toLong else 0L)).toDF("id", "k")
    val build = Seq((0L, "a"), (1L, "b"), (2L, "c"), (6L, "d")).toDF("k", "v")
    val salted = SkewJoin.saltedJoin(probe, build, "k", salts = 8)
      .select("id", "k", "v").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val plain = probe.join(build, "k")
      .select("id", "k", "v").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(salted.sorted.toSeq == plain.sorted.toSeq)
  }

  test("probe-side salt spreads a hot key even when its rows are IDENTICAL") {
    import spark.implicits._
    // the degenerate case a content hash cannot spread: every hot row equal
    val probe = (0 until 2000).map(_ => 0L).toDF("k")
    val build = Seq((0L, "x")).toDF("k", "v")
    val salts = probe.withColumn("__salt", SkewJoin.saltExpr(8, Nil))
      .select("__salt").distinct().count()
    assert(salts == 8L)
    // and the salted join still returns every row exactly once
    assert(SkewJoin.saltedJoin(probe, build, "k", salts = 8).count() == 2000L)
  }

  test("unorderable probe column: default path rejected up front, saltBy works") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // MapType cannot be totally sorted, so the retry-safe positional
    // salt is impossible — saltedJoin must demand an explicit saltBy
    // instead of throwing an AnalysisException from the sort (or
    // silently re-salting sort ties on a task retry)
    val probe = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)), (1L, Map("c" -> 3)))
      .toDF("k", "m")
    val build = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(probe, build, "k", salts = 4)
    }
    assert(ex.getMessage.contains("saltBy"))
    // with a deterministic saltBy the map column rides along untouched
    val withId = probe.withColumn("rid", monotonically_increasing_id())
    val got = SkewJoin.saltedJoin(withId, build, "k", salts = 4, saltBy = Seq("rid"))
    assert(got.count() == 3L)
  }

  test("gridJoin hot cell: AQE skew-join splits the oversized cell partition") {
    import graft.operators.SpatialJoin
    import org.apache.spark.sql.functions._
    // 60k points, 80% inside ONE 10x10 grid cell — the skewed spatial
    // distribution the grid join concentrates onto a single reducer.
    // The mitigation contract is Spark's AQE skew-join split (the cell
    // join is a plain equi-join, exactly what OptimizeSkewedJoin
    // handles); this pins that reliance with a plan assertion instead of
    // leaving it as an undemonstrated claim.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // detection thresholds scaled down to the test's data volume
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      graft.functions.GeoFunctions.register(spark)
      val pts = spark.sql("""
        SELECT id, ST_GeomFromText('POINT(' ||
                 CAST(CASE WHEN id % 5 < 4 THEN (id % 97) / 10.0
                           ELSE (id % 37) * 10.0 + 15.0 END AS STRING) || ' ' ||
                 CAST(CASE WHEN id % 5 < 4 THEN (id % 89) / 10.0
                           ELSE 15.0 END AS STRING) || ')') AS geom
        FROM range(0, 60000) t(id)""")
      val boxes = spark.sql("""
        SELECT * FROM VALUES
          (1, ST_MakeEnvelope(0.0, 0.0, 9.0, 9.0)),
          (2, ST_MakeEnvelope(100.0, 10.0, 160.0, 20.0)),
          (3, ST_MakeEnvelope(5000.0, 5000.0, 5001.0, 5001.0)) AS t(bid, bgeom)""")
      val grid = SpatialJoin.gridJoin(pts, "geom", boxes, "bgeom", cellSize = 10.0)
        .select("id", "bid")
      // execute THIS queryExecution (count() would plan its own), so the
      // adaptive plan below is the final, executed one
      val n = grid.collect().length.toLong
      val plan = grid.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"hot cell was not split by AQE skew-join:\n$plan")
      // and splitting never changes the result
      val viaBroadcast = SpatialJoin.broadcastJoin(pts, "geom", boxes, "bgeom").count()
      assert(n == viaBroadcast, s"grid ($n) != broadcast ($viaBroadcast)")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hotKeys surfaces only keys above the threshold, heaviest first") {
    import spark.implicits._
    val df = (Seq.fill(100)(1L) ++ Seq.fill(50)(2L) ++ Seq.fill(3)(3L))
      .toDF("k")
    val hot = SkewJoin.hotKeys(df, "k", minRows = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hot.toSeq == Seq((1L, 100L), (2L, 50L)))
  }
}
