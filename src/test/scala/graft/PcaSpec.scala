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

  test("moments rejects ragged dimensions loudly") {
    import spark.implicits._
    val ragged = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("v").coalesce(1)
    val e = intercept[Exception] { Pca.moments(ragged, "v") }
    assert(e.getMessage.contains("ragged") ||
      String.valueOf(e.getCause).contains("ragged"))
  }
}
