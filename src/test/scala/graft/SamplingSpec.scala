package graft

import graft.operators.Sampling
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("deterministicSample rate is honored and selection survives repartitioning") {
    import spark.implicits._
    val df = (0 until 20000).map(_.toLong).toDF("id")
    val picked = Sampling.deterministicSample(df, "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    // md5 is uniform: 25% ± 2%
    assert(math.abs(picked.size / 20000.0 - 0.25) < 0.02)
    // identical selection regardless of physical layout
    val repicked = Sampling.deterministicSample(df.repartition(13), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(repicked == picked)
    // independent salt decorrelates: overlap ≈ rate², not rate
    val other = Sampling.deterministicSample(df, "id", 0.25, salt = "s2")
      .collect().map(_.getLong(0)).toSet
    val overlap = (picked & other).size / 20000.0
    assert(overlap > 0.04 && overlap < 0.09)
  }

  test("splitTrainTest partitions every row exactly once, consistent with sampling") {
    import spark.implicits._
    val df = (0 until 5000).map(_.toLong).toDF("id")
    val split = Sampling.splitTrainTest(df, "id", 0.25).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(split.size == 5000)
    val test = split.collect { case (k, "test") => k }.toSet
    assert(math.abs(test.size / 5000.0 - 0.25) < 0.03)
    // the test fraction IS the deterministic sample of the same rate
    val sampled = Sampling.deterministicSample(df, "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(test == sampled)
  }

  test("hexThreshold edge rates select nothing / everything") {
    import spark.implicits._
    val df = (0 until 100).map(_.toLong).toDF("id")
    assert(Sampling.deterministicSample(df, "id", 0.0).count() == 0L)
    assert(Sampling.deterministicSample(df, "id", 1.0).count() == 100L)
  }
}
