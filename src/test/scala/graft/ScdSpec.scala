package graft

import graft.operators.Scd
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 upsert: every row fate on a hand-checked fixture, null-safe
  * attribute comparison, multi-attribute change detection, and the
  * plan shape (one key-join, no window/sort). */
class ScdSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("scd-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def dimRow(k: Long, seg: String, from: java.lang.Long,
      to: java.lang.Long, cur: Boolean) = (k, seg, from, to, cur)

  test("row fates: history, untouched, no-op, changed, new key") {
    val sp = spark
    import sp.implicits._
    val dim = Seq(
      dimRow(1L, "A", 0L, null, true),     // untouched (not in batch)
      dimRow(2L, "B", 0L, null, true),     // no-op (batch equal)
      dimRow(3L, "C", 0L, null, true),     // changed -> close + reopen
      dimRow(3L, "OLD", -5L, 0L, false)    // closed history passes through
    ).toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val batch = Seq((2L, "B"), (3L, "X"), (9L, "NEW"))
      .toDF("k", "seg")
    val out = Scd.scd2Apply(dim, batch, Seq("k"), Seq("seg"), asOf = 10L)
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3), r.getBoolean(4)))
      .toSeq
    assert(out == Seq(
      (1L, "A", 0L, null, true),
      (2L, "B", 0L, null, true),
      (3L, "OLD", -5L, 0L, false),
      (3L, "C", 0L, 10L, false),
      (3L, "X", 10L, null, true),
      (9L, "NEW", 10L, null, true)))
  }

  test("malformed NULL is_current routes to history, never silently dropped") {
    val sp = spark
    import sp.implicits._
    val dim = Seq(
      (1L, "A", 0L, java.lang.Long.valueOf(5L), null: java.lang.Boolean), // malformed
      (1L, "B", 5L, null: java.lang.Long, java.lang.Boolean.valueOf(true))
    ).toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val batch = Seq((1L, "C")).toDF("k", "seg")
    val out = Scd.scd2Apply(dim, batch, Seq("k"), Seq("seg"), asOf = 10L)
      .orderBy("valid_from")
      .collect()
      .map(r => (r.getString(1), r.get(2), r.get(3), r.getBoolean(4)))
      .toSeq
    // the null-flag row survives as history with the flag normalized to
    // false; the true-current row closes and the batch row opens
    assert(out == Seq(
      ("A", 0L, 5L, false),
      ("B", 5L, 10L, false),
      ("C", 10L, null, true)), s"got $out")
  }

  test("null-safe attr compare: null == null is a no-op, null vs value is a change") {
    val sp = spark
    import sp.implicits._
    val dim = Seq(
      (1L, Option.empty[String], 0L, Option.empty[Long], true),
      (2L, Option("V"), 0L, Option.empty[Long], true)
    ).toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val batch = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "seg")
    val out = Scd.scd2Apply(dim, batch, Seq("k"), Seq("seg"), asOf = 7L)
      .orderBy("k", "valid_from").collect()
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1L && out(0).getBoolean(4))    // unchanged
    assert(out(1).getLong(0) == 2L && !out(1).getBoolean(4) && out(1).getLong(3) == 7L)
    assert(out(2).getLong(0) == 2L && out(2).getBoolean(4) && out(2).isNullAt(1))
  }

  test("multi-attribute: any differing attr closes the version") {
    val sp = spark
    import sp.implicits._
    val dim = Seq((1L, "A", 5, 0L, Option.empty[Long], true))
      .toDF("k", "seg", "tier", "valid_from", "valid_to", "is_current")
    val batch = Seq((1L, "A", 6)).toDF("k", "seg", "tier")
    val out = Scd.scd2Apply(dim, batch, Seq("k"), Seq("seg", "tier"), asOf = 3L)
      .orderBy("valid_from").collect()
    assert(out.length == 2)
    assert(!out(0).getBoolean(5) && out(0).getInt(2) == 5)
    assert(out(1).getBoolean(5) && out(1).getInt(2) == 6)
  }

  test("plan: one key join, no window or global sort") {
    val sp = spark
    import sp.implicits._
    val dim = Seq(dimRow(1L, "A", 0L, null, true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val batch = Seq((1L, "B")).toDF("k", "seg")
    val plan = Scd.scd2Apply(dim, batch, Seq("k"), Seq("seg"), asOf = 1L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }
}
