package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-skew proof for the PPJoin filters in
  * [[graft.operators.Dedup.jaccardJoinExact]]: a corpus of thousands of
  * SHORT NEAR-IDENTICAL documents below the threshold — every doc shares
  * the same 9-token boilerplate plus one unique token, so one boilerplate
  * token lands in every prefix and an unfiltered prefix self-join squares
  * (n²/2 candidate pairs for zero output). The positional filter must cut
  * every one of those pairs BEFORE the pair aggregation, and the exact
  * result must stay identical to brute force on a mixed fixture. */
class JaccardAdversarialSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("positional filter empties candidates on many-short-near-dup corpus") {
    val sp = spark
    import sp.implicits._
    // 3000 docs: 9 shared boilerplate tokens + 1 unique token each.
    // Pairwise J = 9/11 ≈ 0.818 < 0.9. Prefix length = 10 − 9 + 1 = 2, so
    // each prefix = the unique token (df 1) + the first boilerplate token
    // (df ties broken token-asc ⇒ the SAME one for all docs): without the
    // positional filter that bucket alone yields ~4.5M candidate pairs.
    val boiler = (0 until 9).map(i => s"bp$i").mkString(" ")
    val docs = (0 until 3000).map(i => (i.toLong, s"$boiler uniq$i"))
    val (_, cand) = graft.operators.Dedup.jaccardCandidates(
      docs.toDF("id", "t"), "id", "t", threshold = 0.9)
    assert(cand.count() == 0L, "positional filter must cut every pair")
    assert(graft.operators.Dedup.jaccardJoinExact(
      docs.toDF("id", "t"), "id", "t", threshold = 0.9).count() == 0L)
  }

  test("length filter cuts size-incompatible pairs at candidate stage") {
    val sp = spark
    import sp.implicits._
    // A long doc fully containing each short doc's tokens: containment 1
    // but J = 3/30 = 0.1 << 0.5; sizes 3 vs 30 fail t·max <= min
    // (0.5·30 = 15 > 3), so the candidate stage itself must be empty even
    // though every short-doc token collides with the long doc's prefix.
    val longDoc = (0 until 30).map(i => s"w$i").mkString(" ")
    val docs = (1000L, longDoc) +:
      (0 until 50).map(i => (i.toLong, s"w${3 * i % 30} zz$i yy$i"))
    val (_, cand) = graft.operators.Dedup.jaccardCandidates(
      docs.toDF("id", "t"), "id", "t", threshold = 0.5)
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists { case (a, b) => a == 1000L || b == 1000L },
      s"size-incompatible pairs must be cut: ${pairs.toSeq}")
  }

  test("float-safe bounds: t*n landing just above an integer keeps the pair") {
    val sp = spark
    import sp.implicits._
    // 0.07 · 100 = 7.000000000000001 in doubles. Doc a = 7 tokens, all
    // inside doc b's 100: J = 7/100 = 0.07 exactly — qualifying. The 7
    // shared tokens have df 2 so they rank LAST in b (ranks 94–100); b's
    // correct prefix is 100 − ceil(7.0…) + 1 = 94 and just reaches the
    // first shared token, but an unguarded ceil gives 8 → prefix 93 →
    // pair silently missed. The unguarded verification inequality
    // 7 >= 7.000000000000001 ALSO rejects it. This fixture trips both.
    val shared = (0 until 7).map(i => s"sh$i")
    val a = shared.mkString(" ")
    val b = ((0 until 93).map(i => s"b$i") ++ shared).mkString(" ")
    val docs = Seq((1L, a), (2L, b))
    val got = graft.operators.Dedup.jaccardJoinExact(
      docs.toDF("id", "t"), "id", "t", threshold = 0.07).collect()
    assert(got.length == 1 && got.head.getLong(2) == 7L,
      s"boundary pair must survive: ${got.toSeq}")
  }
}
