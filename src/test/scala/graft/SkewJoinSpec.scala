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

  test("hotKeys surfaces only keys above the threshold, heaviest first") {
    import spark.implicits._
    val df = (Seq.fill(100)(1L) ++ Seq.fill(50)(2L) ++ Seq.fill(3)(3L))
      .toDF("k")
    val hot = SkewJoin.hotKeys(df, "k", minRows = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hot.toSeq == Seq((1L, 100L), (2L, 50L)))
  }
}
