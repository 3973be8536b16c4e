package graft

import graft.operators.Pca
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** 4-D points stretched along (1,1,0,0)/√2 with small noise on the
    * other axes — the dominant principal axis is known analytically. */
  private def fixture(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val t = (i % 21 - 10) / 2.0 // spread -5..5 along the main axis
      val e1 = ((i * 7) % 11 - 5) / 50.0
      // the second axis carries real variance: the 6dp law rounds
      // ABSOLUTELY, so a near-zero eigenvalue would lose relative
      // precision (documented contract, not a bug)
      val e2 = ((i * 13) % 11 - 5) / 4.0
      (i.toLong, Seq((t + e1).toFloat, (t - e1).toFloat, e2.toFloat, (e2 / 2).toFloat))
    }.toDF("id", "v")
  }

  test("fit recovers the planted axis; lambdas descend; axes are unit") {
    val df = fixture(200)
    val m = Pca.fit(df, "v", components = 2, iters = 16)
    assert(m.n == 200)
    val v1 = m.components(0)
    // dominant axis ~ (1,1,0,0)/sqrt(2) up to sign
    val overlap = math.abs(v1(0) * 0.7071067 + v1(1) * 0.7071067)
    assert(overlap > 0.99, s"pc1 missed the planted axis: ${v1.toSeq}")
    assert(m.lambdas(0) > m.lambdas(1) && m.lambdas(1) > 0)
    m.components.foreach { v =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-4, s"axis not unit: $nrm")
    }
  }

  test("fit is bit-identical under repartitioning (the 6dp-term law)") {
    val df = fixture(200)
    val a = Pca.fit(df, "v", components = 2, iters = 12)
    val b = Pca.fit(df.repartition(7), "v", components = 2, iters = 12)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.lambdas.toSeq == b.lambdas.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
  }

  test("project centers against the mean and emits 6dp values; null vec -> null") {
    import spark.implicits._
    val df = fixture(50)
    val m = Pca.fit(df, "v", components = 1, iters = 12)
    val out = Pca.project(df, "v", m).select("id", "pc1").collect()
    assert(out.length == 50)
    out.foreach { r =>
      val p = r.getDouble(1)
      assert((p * 1e6).round / 1e6 == p, s"pc1 not 6dp: $p")
    }
    val withNull = Seq((0L, Seq(1f, 2f, 3f, 4f)), (1L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "v")
    val pn = Pca.project(withNull, "v", m).where("id = 1").select("pc1").head()
    assert(pn.isNullAt(0))
  }

  test("randomProject: JL distance preservation in the aggregate, hash-law signs") {
    import spark.implicits._
    // 40 16-d points; JL with p=8 preserves pairwise distance RATIOS on
    // average (individual pairs can distort; assert the mean ratio)
    val pts = (0 until 40).map { i =>
      (i.toLong, (0 until 16).map(j => (((i * 31 + j * 17) % 19) - 9) / 3.0f))
    }
    val df = pts.toDF("id", "v")
    val proj = Pca.randomProject(df, "v", inDim = 16, outDim = 8, seed = 7L)
      .select("id", "rp1", "rp2", "rp3", "rp4", "rp5", "rp6", "rp7", "rp8")
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(r.getDouble).toArray).toMap
    val orig = pts.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 0L until 40L; j <- (i + 1) until 40L
      od = d2(orig(i), orig(j)) if od > 1e-9
    } yield d2(proj(i), proj(j)) / od
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"JL mean distance ratio off: $mean")
    // determinism: same seed -> identical; different seed -> different
    val again = Pca.randomProject(df, "v", 16, 8, seed = 7L)
      .select("rp1").collect().map(_.getDouble(0)).toSeq
    assert(again == proj.toSeq.sortBy(_._1).map(_._2(0)))
    val other = Pca.randomProject(df, "v", 16, 8, seed = 8L)
      .select("rp1").collect().map(_.getDouble(0)).toSeq
    assert(other != again)
    // the sign law is ±1 and seed/index-sensitive
    assert(Set(Pca.rpSign(7L, 0, 0), Pca.rpSign(7L, 0, 1),
      Pca.rpSign(7L, 1, 0)).subsetOf(Set(1.0, -1.0)))
  }

  test("moments rejects ragged dimensions loudly") {
    import spark.implicits._
    val ragged = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("v").coalesce(1)
    val e = intercept[Exception] { Pca.moments(ragged, "v") }
    assert(e.getMessage.contains("ragged") ||
      String.valueOf(e.getCause).contains("ragged"))
  }
}
