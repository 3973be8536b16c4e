package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The sf0.1 twin rows re-run the bench-subset contract queries at 10x
  * the driver's correctness scale factor (VERDICT r11 #8): a
  * partition-count-sensitive wrong answer that passes at sf0.01 must
  * fail the gate, not survive until a judge audit. This spec pins the
  * two pieces that make a twin a REAL check: the DuckDB-side CTE
  * rewrite (a missed table ref would silently compare sf0.01 oracle
  * output against sf0.1 engine output) and the derived-session wiring
  * (a twin prep that clobbered the base session's views would corrupt
  * concurrently-running sf0.01 queries instead of failing). */
class Sf01TwinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("sf01-twins").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("oracle rewrite shadows every referenced table with an sf0.1 CTE") {
    val plain = SparkEntry.oracleAtSf01(
      "SELECT l_orderkey FROM lineitem ORDER BY l_orderkey")
    assert(plain.startsWith("WITH lineitem AS (SELECT * FROM read_parquet(" +
      "'/root/testdata/sf0.1/lineitem.parquet'))"))
    assert(plain.endsWith("SELECT l_orderkey FROM lineitem ORDER BY l_orderkey"))
    // no spurious CTEs for unreferenced tables
    assert(!plain.contains("orders.parquet") && !plain.contains("events.parquet"))
  }

  test("oracle rewrite merges into an existing WITH clause") {
    val withSql = SparkEntry.oracleAtSf01(
      """
      WITH v AS (SELECT user_id FROM events)
      SELECT e.event_id FROM events e JOIN v ON e.user_id = v.user_id""")
    // exactly one WITH keyword: the CTE list is merged, not nested
    assert("(?i)\\bWITH\\b".r.findAllIn(withSql).size == 1)
    assert(withSql.contains("events AS (SELECT * FROM read_parquet(" +
      "'/root/testdata/sf0.1/events.parquet')), v AS"))
  }

  test("rewrite does not mistake ORDER BY / PARTITION BY for table names") {
    val sql = SparkEntry.oracleAtSf01(
      """SELECT doc_id, row_number() OVER (PARTITION BY source ORDER BY doc_id)
         FROM documents ORDER BY doc_id""")
    assert(sql.contains("documents.parquet"))
    assert(!sql.contains("part.parquet") && !sql.contains("orders.parquet"))
  }

  test("every twin has both a query and a rewritten oracle") {
    val twins = SparkEntry.queries.keys.filter(_.startsWith("sf01_")).toSet
    assert(twins.size == 109) // r5 subset + r12's q135/q137 + the
    // round-12 selection operators (q141-q145) + retrieval/reduction/
    // dissolve (q146-q149) + BPE (q150-q151) + weighted sampling (q152)
    // + mixture plan (q155) + contamination report (q156) + scored
    // dedup elections (q157-q158) + kNN graph (q159) + hashed embeddings (q160) + token ids (q161) + cosine edges (q162) + event funnel (q164) + forward as-of (q165)
    twins.foreach { t =>
      val o = SparkEntry.oracleSql.get(t)
      assert(o.isDefined, s"$t has no oracle")
      assert(o.get.contains("/root/testdata/sf0.1/"), s"$t oracle not rewritten")
    }
  }

  test("twin runs at sf0.1 on a derived session without touching base views") {
    assume(new java.io.File("/root/testdata/sf0.1/lineitem.parquet").exists())
    // base contract view at sf0.01 in THIS session
    val sf001 = "/root/testdata/sf0.01"
    val baseRows = SparkEntry.queries("q14_extent")(spark, sf001).collect()
    val baseLineitem = spark.table("lineitem").count()
    // twin must read 10x the rows without re-pointing this session's views
    val twin = SparkEntry.queries("sf01_q14_extent")(spark, sf001)
    val twinRows = twin.collect()
    assert(twinRows.length == baseRows.length) // per-returnflag extents
    assert(spark.table("lineitem").count() == baseLineitem,
      "twin prep clobbered the base session's sf0.01 views")
    // the sf0.1 extent must cover at least the sf0.01 extent per flag
    val bx = baseRows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    twinRows.foreach { r =>
      assert(r.getDouble(3) >= bx(r.getString(0)),
        s"sf0.1 xmax shrank for flag ${r.getString(0)}")
    }
  }
}
