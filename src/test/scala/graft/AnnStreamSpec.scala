package graft

import graft.operators.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental SemDeDup: prefix-decomposition equals the batch
  * operator, replays emit nothing, and out-of-id-order arrival follows
  * arrival precedence — the three contract points of
  * [[Ann.semanticDedupIncremental]] (q133 pins the end-to-end streaming
  * harness against the q119 DuckDB oracle; this spec pins the operator
  * semantics in isolation). */
class AnnStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("ann-stream").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // two tight clusters around orthogonal axes + per-id jitter: ids of
  // the same parity are near-duplicates (cos ~ 1), cross-parity cos ~ 0
  private def vecs(ids: Seq[Long]): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map { id =>
      val base = if (id % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      (id, base.zipWithIndex.map { case (v, d) =>
        v + (0.001f * ((id + d) % 5)) })
    }.toDF("vec_id", "embedding")
  }

  private val cents = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))

  private def keptIds(df: DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  test("id-ordered batches reproduce the batch operator exactly") {
    val all = vecs(0L until 20L)
    val batchResult = keptIds(Ann.semanticDedup(all, cents, 0.9))
    val b1 = vecs(0L until 10L)
    val b2 = vecs(10L until 20L)
    val out1 = Ann.semanticDedupIncremental(b1, cents, 0.9, seen = None)
    val seen1 = Ann.semanticKeyset(b1, cents)
    val out2 = Ann.semanticDedupIncremental(b2, cents, 0.9, seen = Some(seen1))
    assert(keptIds(out1) ++ keptIds(out2) == batchResult)
    // near-dup structure sanity: only the two cluster exemplars survive
    assert(batchResult == Set(0L, 1L))
  }

  test("a replayed batch emits nothing (rows already in seen)") {
    val b1 = vecs(0L until 10L)
    val seen1 = Ann.semanticKeyset(b1, cents)
    val replay = Ann.semanticDedupIncremental(b1, cents, 0.9, seen = Some(seen1))
    assert(replay.count() == 0)
  }

  test("out-of-id-order arrival follows arrival precedence") {
    // batch of HIGH ids first: its survivors are kept even though lower
    // ids arrive later — the later lows are dropped against seen highs
    val hi = vecs(10L until 20L)
    val outHi = Ann.semanticDedupIncremental(hi, cents, 0.9, seen = None)
    assert(keptIds(outHi) == Set(10L, 11L))
    val seenHi = Ann.semanticKeyset(hi, cents)
    val lo = vecs(0L until 10L)
    val outLo = Ann.semanticDedupIncremental(lo, cents, 0.9, seen = Some(seenHi))
    assert(outLo.count() == 0, "late-arriving lower ids must defer to seen rows")
  }
}
