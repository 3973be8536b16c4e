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

  test("null keys are sampled deterministically, not silently dropped") {
    import spark.implicits._
    val df = Seq(Option(1L), Option(2L), None, None).toDF("id")
    // rate 1.0 must keep EVERYTHING, null keys included (md5(null) used
    // to null the predicate and drop them)
    assert(Sampling.deterministicSample(df, "id", 1.0).count() == 4)
    assert(Sampling.deterministicSample(df, "id", 0.0).count() == 0)
    // all null keys hash alike (as ""), so they move between splits
    // together — and every row is assigned a split
    val split = Sampling.splitTrainTest(df, "id", 0.5).collect()
      .map(r => (Option(r.get(0)), r.getString(1)))
    assert(split.length == 4)
    assert(split.filter(_._1.isEmpty).map(_._2).distinct.length == 1)
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

  test("stratifiedSample: per-stratum rates, default drop, nested supersets") {
    import spark.implicits._
    val df = (0 until 30000).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "src")
    val rates = Map("s0" -> 1.0, "s1" -> 0.25)
    val got = Sampling.stratifiedSample(df, "src", "id", rates, defaultRate = 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("s0") == 10000)                            // rate 1.0 keeps all
    assert(math.abs(bySrc("s1") / 10000.0 - 0.25) < 0.02)   // rate honored
    assert(!bySrc.contains("s2"))                           // default 0 drops
    // selection ignores the stratum label: the s1 picks ARE the plain
    // deterministic sample at the same rate (supersets nest by rate)
    val plain = Sampling.deterministicSample(
        df.where($"src" === "s1"), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(got.collect { case (id, "s1") => id }.toSet == plain)
    // layout-independent like every sampler here
    val re = Sampling.stratifiedSample(df.repartition(17), "src", "id",
      rates, defaultRate = 0.0).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(re.toSet == got.toSet)
  }

  test("temperatureResample: alpha=1 keeps everything, alpha flattens toward uniform, deterministic") {
    import spark.implicits._
    // skewed corpus: domain a = 40 rows, b = 10 rows
    val df = ((0 until 40).map(i => (i.toLong, "a")) ++
      (100 until 110).map(i => (i.toLong, "b"))).toDF("id", "dom")
    val all = Sampling.temperatureResample(df, "dom", "id", alpha = 1.0)
    assert(all.count() == 50)
    val half = Sampling.temperatureResample(df, "dom", "id", alpha = 0.5)
    val byDom = half.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest domain keeps everything; 'a' expects 40·(10/40)^0.5 = 20
    assert(byDom("b") == 10)
    assert(byDom.getOrElse("a", 0L) > 8 && byDom("a") < 32, s"a kept ${byDom.get("a")}")
    // deterministic: same selection regardless of partitioning
    val again = Sampling.temperatureResample(df.repartition(7), "dom", "id", alpha = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == half.select("id").collect().map(_.getLong(0)).toSet)
    // invalid alpha rejected
    intercept[IllegalArgumentException] {
      Sampling.temperatureResample(df, "dom", "id", alpha = 0.0)
    }
    // NULL domain is a domain like any other — alpha=1 keeps its rows
    val withNull = df.union(Seq((200L, null.asInstanceOf[String]),
      (201L, null.asInstanceOf[String])).toDF("id", "dom"))
    assert(Sampling.temperatureResample(withNull, "dom", "id", alpha = 1.0)
      .count() == 52)
  }

  test("hexThreshold edge rates select nothing / everything") {
    import spark.implicits._
    val df = (0 until 100).map(_.toLong).toDF("id")
    assert(Sampling.deterministicSample(df, "id", 0.0).count() == 0L)
    assert(Sampling.deterministicSample(df, "id", 1.0).count() == 100L)
  }

  test("weightedSample: weight-biased, deterministic, weight-guarded") {
    import spark.implicits._
    // 200 light rows (w=1) + 200 heavy (w=50): a 50-row sample should
    // be dominated by heavy rows (each heavy is ~50x more likely first)
    val df = (0 until 400).map(i => (i.toLong, if (i < 200) 1.0 else 50.0))
      .toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    assert(picked.size == 50)
    val heavy = picked.count(_ >= 200)
    assert(heavy >= 40, s"heavy rows underrepresented: $heavy/50")
    // deterministic under repartitioning; different salt -> different set
    val again = Sampling.weightedSample(df.repartition(7), "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    assert(again == picked)
    val salted = Sampling.weightedSample(df, "id", "w", 50, salt = "s2")
      .collect().map(_.getLong(0)).toSet
    assert(salted != picked)
    // null/zero/negative weights are excluded, never NaN-ranked
    val guarded = Sampling.weightedSample(
      spark.sql("""SELECT * FROM VALUES (1L, 0.0D), (2L, -3.0D),
                   (3L, CAST(NULL AS DOUBLE)), (4L, 2.0D) AS t(id, w)"""),
      "id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    assert(guarded == Set(4L))
  }

  test("weightedSamplePerGroup: k per group, ranks 1..k, schema keeps input cols") {
    import spark.implicits._
    val df = (0 until 60).map(i => (i.toLong, s"g${i % 3}", 1.0 + i % 7))
      .toDF("id", "grp", "w")
    val out = Sampling.weightedSamplePerGroup(df, "grp", "id", "w", 4)
    assert(out.columns.toSeq == Seq("id", "grp", "w", "sample_rank"))
    val byGroup = out.collect().groupBy(_.getString(1))
    assert(byGroup.keySet == Set("g0", "g1", "g2"))
    byGroup.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4))
    }
  }

  test("topPByScore: brute-force nucleus per group, ties, p=1, dominant row") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val rows = (0 until 500).map(i =>
      (i % 7, i.toLong, (rnd.nextInt(20) + 1).toLong)) ++
      Seq((9, 1000L, 1000L), (9, 1001L, 1L), (9, 1002L, 1L)) // dominant head
    def brute(p: Double): Set[(Int, Long)] = rows.groupBy(_._1).toSeq.flatMap {
      case (g, xs) =>
        val sorted = xs.map(x => (x._3, x._2)).sortBy { case (s, id) => (-s, id) }
        val total = sorted.map(_._1).sum.toDouble
        val cumPrev = sorted.scanLeft(0L)(_ + _._1) // mass BEFORE index i
        sorted.zip(cumPrev).collect {
          case ((_, id), cp) if cp < p * total => (g, id)
        }
    }.toSet
    Seq(0.3, 0.6, 1.0).foreach { p =>
      val got = graft.operators.Sampling.topPByScore(
          rows.toDF("g", "id", "s"), "g", "id", "s", p)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(got == brute(p), s"p=$p: got ${got.size}, brute ${brute(p).size}")
    }
    // p=1.0 keeps everything (cum_prev < total holds for every row)
    assert(graft.operators.Sampling.topPByScore(
      rows.toDF("g", "id", "s"), "g", "id", "s", 1.0).count() == rows.size)
    // the dominant row alone exceeds p yet survives; its tail does not
    val g9 = graft.operators.Sampling.topPByScore(
        rows.toDF("g", "id", "s"), "g", "id", "s", 0.5)
      .where(org.apache.spark.sql.functions.col("g") === 9)
      .collect().map(_.getLong(1)).toSet
    assert(g9 == Set(1000L))
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.topPByScore(rows.toDF("g", "id", "s"), "g", "id", "s", 0.0)
    }
  }
}
