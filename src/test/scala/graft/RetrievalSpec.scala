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

  test("retrievalMetrics: hand-checked P/R/RR/AP and a rz6d-replayed nDCG") {
    val sp = spark
    import sp.implicits._
    import graft.util.Round6.rz6d
    // q0: graded rels 3/2/1 on d1/d3/d2; retrieved hits at ranks 2,3,5.
    // q1: one relevant doc the run never retrieved (all-zero metrics,
    //     but the query must still appear — trec_eval's evaluated set).
    val qrels = Seq((0L, 1L, 3), (0L, 3L, 2), (0L, 2L, 1), (0L, 50L, 0),
      (1L, 100L, 1)).toDF("qid", "doc_id", "rel")
    val results = Seq((0L, 9L, 1), (0L, 1L, 2), (0L, 3L, 3), (0L, 8L, 4),
      (0L, 2L, 5), (1L, 9L, 1), (1L, 8L, 2)).toDF("qid", "doc_id", "rnk")
    val out = Retrieval.retrievalMetrics(results, qrels, k = 5)
      .orderBy("qid").collect()
    assert(out.length == 2)
    val q0 = out(0)
    assert((q0.getLong(1), q0.getInt(2)) == ((3L, 3)))
    assert(q0.getDouble(3) == 0.6)  // p@5
    assert(q0.getDouble(4) == 1.0)  // recall@5
    assert(q0.getDouble(5) == 0.5)  // rr: first hit at rank 2
    // AP: hits at 2,3,5 -> (rz6(1/2) + rz6(2/3) + rz6(3/5)) / 3
    val ap = rz6d((rz6d(1.0 / 2) + rz6d(2.0 / 3) + rz6d(3.0 / 5)) / 3)
    assert(q0.getDouble(6) == ap)
    // nDCG replayed with the same rz6-term / exact-sum law
    def g(rel: Int, r: Int) = rz6d((math.pow(2, rel) - 1) / (math.log(r + 1.0) / math.log(2)))
    val dcg = g(3, 2) + g(2, 3) + g(1, 5)
    val idcg = g(3, 1) + g(2, 2) + g(1, 3)
    assert(q0.getDouble(7) == rz6d(dcg / idcg))
    val q1 = out(1)
    assert((q1.getLong(1), q1.getInt(2)) == ((1L, 0)))
    assert((3 to 7).forall(q1.getDouble(_) == 0.0))
    // a judged query with NO results row at all still evaluates to zeros
    val out2 = Retrieval.retrievalMetrics(
      results.where($"qid" === 0L), qrels, k = 5).orderBy("qid").collect()
    assert(out2.length == 2 && out2(1).getInt(2) == 0 && out2(1).getDouble(7) == 0.0)
  }

  test("maxSimTopK / maxSimRerank: hand-computed scores, candidate restriction") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val bag = ArrayType(ArrayType(FloatType))
    val qSchema = StructType(Seq(StructField("qid", LongType),
      StructField("qvecs", bag)))
    val dSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("dvecs", bag)))
    val q = spark.createDataFrame(Seq(
      Row(0L, Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))).asJava, qSchema)
    val d = spark.createDataFrame(Seq(
      Row(10L, Seq(Seq(1.0f, 0.0f))),                     // 1.0 + 0.0
      Row(11L, Seq(Seq(0.6f, 0.8f))),                     // 0.6 + 0.8
      Row(12L, Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))).asJava, // 1 + 1
      dSchema)
    val top = Retrieval.maxSimTopK(q, d, k = 2).orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(top.toSeq == Seq((12L, 2.0, 1), (11L, 1.4, 2)))
    // rerank sees ONLY the candidate pairs: doc 12 cannot surface
    val cands = spark.createDataFrame(Seq(Row(0L, 10L), Row(0L, 11L)).asJava,
      StructType(Seq(StructField("qid", LongType), StructField("doc_id", LongType))))
    val rr = Retrieval.maxSimRerank(q, d, cands, k = 2).orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rr.toSeq == Seq((11L, 1.4, 1), (10L, 1.0, 2)))
    // partition-independent: the score is a fixed-order lambda sum of
    // 6dp-snapped terms, so a different layout replays bit-identically
    val again = Retrieval.maxSimTopK(q, d.repartition(5), k = 2)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(again.toSeq == top.toSeq)
  }

  test("maxSim degenerate bags: null/empty vector bags never occupy rank slots") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val bag = ArrayType(ArrayType(FloatType))
    val qSchema = StructType(Seq(StructField("qid", LongType),
      StructField("qvecs", bag)))
    val dSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("dvecs", bag)))
    val q = spark.createDataFrame(Seq(
      Row(0L, Seq(Seq(1.0f, 0.0f))),
      Row(1L, Seq.empty[Seq[Float]]),           // empty query bag
      Row(2L, null)).asJava, qSchema)           // null query bag
    val d = spark.createDataFrame(Seq(
      Row(10L, Seq(Seq(1.0f, 0.0f))),
      Row(11L, Seq(Seq(0.0f, 1.0f))),
      Row(12L, Seq.empty[Seq[Float]]),          // empty doc bag: would
      Row(13L, null)).asJava, dSchema)          // score rz6(-1) unguarded
    val top = Retrieval.maxSimTopK(q, d, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // only query 0 evaluates, and only against the two real docs — the
    // empty-bag doc must NOT fill a rank slot with its -1-seed score
    assert(top.toSet == Set((0L, 10L), (0L, 11L)))
    val cands = spark.createDataFrame(
      (for (qq <- 0L to 2L; dd <- 10L to 13L) yield Row(qq, dd)).asJava,
      StructType(Seq(StructField("qid", LongType), StructField("doc_id", LongType))))
    val rr = Retrieval.maxSimRerank(q, d, cands, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rr.toSet == Set((0L, 10L), (0L, 11L)))
  }
}
