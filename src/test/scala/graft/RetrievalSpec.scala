package graft

import graft.operators.Retrieval
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Reciprocal-rank fusion: hand-computed scores on a tiny fixture,
  * the one-list outer-join path, tie-breaks, and the fixed-order-sum
  * determinism contract under repartitioning. */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("retrieval-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("rrfFuse: hand-computed fusion, outer-join path, tie-break by id") {
    val sp = spark
    import sp.implicits._
    // list A ranks docs 10,11,12; list B ranks 11,10,13
    val a = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3)).toDF("qid", "id", "rnk")
    val b = Seq((0L, 11L, 1), (0L, 10L, 2), (0L, 13L, 3)).toDF("qid", "id", "rnk")
    val out = Retrieval.rrfFuse(Seq(a, b), "qid", "id", "rnk", k = 10)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    // 10 and 11 each score 1/61 + 1/62 (symmetric) -> tie, id asc
    val both = 1.0 / 61 + 1.0 / 62
    assert(out(0) == ((10L, 2, both, 1)))
    assert(out(1) == ((11L, 2, both, 2)))
    // 12 and 13 each 1/63 from one list only
    assert(out(2) == ((12L, 1, 1.0 / 63, 3)))
    assert(out(3) == ((13L, 1, 1.0 / 63, 4)))
  }

  test("rrfFuse: per-query isolation, k cut, partition-independent doubles") {
    val sp = spark
    import sp.implicits._
    val a = (1 to 30).map(i => (i.toLong % 3, 100L + i, i / 3 + 1)).toDF("qid", "id", "rnk")
    val b = (1 to 30).map(i => (i.toLong % 3, 100L + ((i * 7) % 30), i / 3 + 1)).toDF("qid", "id", "rnk")
    val fused = Retrieval.rrfFuse(Seq(a, b), "qid", "id", "rnk", k = 5)
    val r1 = fused.orderBy("qid", "rnk").collect().map(_.toSeq).toSeq
    assert(fused.groupBy("qid").count().collect().forall(_.getLong(1) == 5L))
    // same frames through a different partitioning -> bit-identical doubles
    val r2 = Retrieval.rrfFuse(Seq(a.repartition(7), b.repartition(3)),
        "qid", "id", "rnk", k = 5)
      .orderBy("qid", "rnk").collect().map(_.toSeq).toSeq
    assert(r1 == r2)
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a), "qid", "id", "rnk", k = 5)
    }
  }
}
