package graft

import graft.functions.GeoFunctions
import graft.operators.Freq
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries heavy hitters: the exact regime (capacity >= distinct —
  * the contract row's law), the approximation guarantees below
  * capacity on an adversarial skewed stream, and merge-order
  * robustness of the bounds under repartitioning. */
class FreqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("freq-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GeoFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("exact regime: capacity >= distinct reproduces true counts in order") {
    val sp = spark
    import sp.implicits._
    // 3 items with frequencies 5 / 3 / 3 (tie broken by item asc)
    val df = (Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq.fill(3)("ant"))
      .map(t => ("g", t)).toDF("g", "text")
    val out = Freq.heavyHitterTokens(df, "g", "text", capacity = 8, k = 3)
      .orderBy("rnk").collect()
    assert(out.map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq((1, "alpha", 5L), (2, "ant", 3L), (3, "beta", 3L)))
  }

  test("MG guarantee under capacity: frequent items survive, counts within N/(cap+1)") {
    val sp = spark
    import sp.implicits._
    // 200k rows: 4 heavy items at 30k each, 80k singletons (distinct)
    val heavy = spark.range(120000L)
      .select(concat(lit("hot"), (col("id") % 4)).as("tok"))
    val tail = spark.range(80000L)
      .select(concat(lit("cold"), col("id")).as("tok"))
    val df = heavy.unionByName(tail).repartition(8)
      .select(lit("g").as("g"), col("tok").as("text"))
    val cap = 64
    val n = 200000L
    val bound = n / (cap + 1) // 3076
    val out = spark.sql("SELECT 1").sparkSession.emptyDataFrame
    val hh = Freq.heavyHitterTokens(df, "g", "text", capacity = cap, k = cap)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    // every item with true frequency > N/(cap+1) is present
    (0 until 4).foreach { i =>
      val est = hh.getOrElse(s"hot$i", fail(s"hot$i missing from summary"))
      assert(est <= 30000L, s"MG never overcounts (hot$i -> $est)")
      assert(est >= 30000L - bound, s"undercount bound violated (hot$i -> $est)")
    }
    // reported counts never exceed truth for stragglers either
    hh.foreach { case (t, est) =>
      if (t.startsWith("cold")) assert(est <= 1L + 0, s"straggler $t overcounted: $est")
    }
    assert(hh.size <= cap)
  }

  test("bounds hold under different partitionings (merge order shifts, laws don't)") {
    val sp = spark
    import sp.implicits._
    val base = spark.range(50000L).select(
      when(col("id") % 5 === 0, lit("heavy"))
        .otherwise(concat(lit("u"), col("id"))).as("text"),
      lit("g").as("g"))
    val cap = 32
    val bound = 50000L / (cap + 1)
    Seq(2, 16).foreach { parts =>
      val hh = Freq.heavyHitterTokens(base.repartition(parts), "g", "text",
          capacity = cap, k = cap)
        .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
      val est = hh.getOrElse("heavy", fail(s"heavy missing at parts=$parts"))
      assert(est <= 10000L && est >= 10000L - bound,
        s"parts=$parts est=$est outside [${10000L - bound}, 10000]")
    }
  }

  test("plans as a regular partial/final aggregate (no distinct-item shuffle)") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", "x y z")).toDF("g", "text")
    val plan = Freq.heavyHitterTokens(df, "g", "text", 16, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("mg_topk"), s"expected mg_topk aggregate in plan:\n$plan")
    // partial + final pair: the summary, not the token stream, rides the exchange
    assert("mg_topk".r.findAllIn(plan).size >= 2, s"expected partial+final:\n$plan")
  }

  test("cms: overestimate guarantee, sketch bound, JVM hash-law replay") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val keys = (0 until 3000).map(_ => rnd.nextInt(80).toLong)
    val df = keys.toDF("k").repartition(4)
    val (w, d) = (32, 3)
    val sketch = Freq.cmsBuild(df, "k", w, d)
    assert(sketch.count() <= w.toLong * d, "sketch must be <= depth*width cells")
    val probe = keys.distinct.toDF("k")
    val est = Freq.cmsEstimate(sketch, probe, "k", w, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // CM law replayed in the JVM: bucket = 48-bit md5 prefix of
    // "cms:<row>:<key>" mod width; estimate = min over rows of cell sum
    def bucket(r: Int, k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"cms:$r:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      java.lang.Long.parseLong(hex, 16) % w
    }
    val cells = (for { (k, c) <- exact.toSeq; r <- 0 until d }
      yield ((r, bucket(r, k)), c)).groupBy(_._1).map { case (cell, xs) =>
        cell -> xs.map(_._2).sum }
    exact.foreach { case (k, c) =>
      val expected = (0 until d).map(r => cells((r, bucket(r, k)))).min
      assert(est(k) == expected, s"key $k: est ${est(k)} != replay $expected")
      assert(est(k) >= c, s"key $k: CM estimate ${est(k)} under exact $c")
    }
  }

  test("cms: merge is exactly build-on-union (linearity)") {
    val s = spark; import s.implicits._
    val a = (0 until 500).map(i => (i % 13).toLong).toDF("k")
    val b = (0 until 700).map(i => (i % 29).toLong).toDF("k")
    val (w, d) = (16, 2)
    val merged = Freq.cmsMerge(Freq.cmsBuild(a, "k", w, d), Freq.cmsBuild(b, "k", w, d))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Freq.cmsBuild(a.unionByName(b), "k", w, d)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
    intercept[IllegalArgumentException] { Freq.cmsBuild(a, "k", 0, 2) }
    intercept[IllegalArgumentException] { Freq.cmsEstimate(a, a, "k", 16, 0) }
  }

  test("exactQuantilesByGroup matches per-group sorted truth") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(83)
    val rows = (0 until 3000).map(i => ((i % 11).toLong, rnd.nextInt(50) * 1.5))
    val qs = Seq(0.25, 0.5, 1.0)
    val got = graft.operators.Freq.exactQuantilesByGroup(
        rows.toDF("g", "v").repartition(5), "g", "v", qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      qs.foreach { q =>
        val rank = math.max(1L, math.ceil(q * sorted.size).toLong)
        assert(got((g, q)) == ((rank, sorted((rank - 1).toInt))),
          s"g=$g q=$q: got ${got((g, q))}")
      }
    }
    assert(got.size == 11 * qs.size)
    intercept[IllegalArgumentException] {
      graft.operators.Freq.exactQuantilesByGroup(rows.toDF("g", "v"), "g", "v", Seq(1.5))
    }
  }

  test("quantile rank is float-safe: q*n landing just above an integer") {
    val s = spark; import s.implicits._
    // 0.07 * 100 = 7.000000000000001 in doubles: an unguarded ceil returns
    // rank 8; the type-1 definition says rank 7 (values 1..100 -> 7.0)
    val df = (1 to 100).map(_.toDouble).toDF("v").repartition(5)
    val g = Freq.exactQuantiles(df, "v", Seq(0.07)).collect().head
    assert((g.getLong(1), g.getDouble(2)) == ((7L, 7.0)), s"got $g")
    val rows = (1 to 100).map(i => (1L, i.toDouble))
    val bg = graft.operators.Freq.exactQuantilesByGroup(
      rows.toDF("g", "v"), "g", "v", Seq(0.07)).collect().head
    assert((bg.getLong(2), bg.getDouble(3)) == ((7L, 7.0)), s"got $bg")
  }

  test("skewProfile: exact Gini vs brute force; uniform and one-hot extremes") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(61)
    val keys = (0 until 4000).map(_ => rnd.nextInt(60).toLong) ++
      Seq.fill(2000)(77L) // one hot key
    def brute(ks: Seq[Long]): (Long, Long, Long, Double, Double) = {
      val c = ks.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toSeq
      val sorted = c.sortBy { case (k, n) => (n, k) }.map(_._2)
      val (nk, nr) = (sorted.size.toLong, sorted.sum)
      val num = sorted.zipWithIndex.map { case (ci, idx) =>
        (2L * (idx + 1) - nk - 1) * ci }.sum
      def rz6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      (nr, nk, sorted.max, rz6(sorted.max.toDouble / nr),
        rz6(num.toDouble / (nk.toDouble * nr)))
    }
    def got(ks: Seq[Long]) = {
      val r = graft.operators.Freq.skewProfile(ks.toDF("k").repartition(5), "k")
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    }
    assert(got(keys) == brute(keys))
    // uniform keys -> gini 0
    val uniform = (0 until 900).map(i => (i % 30).toLong)
    assert(got(uniform) == brute(uniform) && got(uniform)._5 == 0.0)
    // one dominant key among singletons -> gini near 1
    val onehot = Seq.fill(10000)(1L) ++ (2L to 11L)
    assert(got(onehot) == brute(onehot) && got(onehot)._5 > 0.89)
  }

  test("exactQuantiles: rank-at-ceil(q*n) matches the sorted truth, ties included") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23)
    // heavy ties (values drawn from 40 distincts) + nulls to drop
    val vals = (0 until 2347).map(_ => rnd.nextInt(40) * 0.5)
    val df = vals.map(Option(_)).patch(7, Seq(None, None), 0).toDF("v")
      .repartition(5)
    val qs = Seq(0.1, 0.25, 0.5, 0.9, 1.0)
    val got = Freq.exactQuantiles(df, "v", qs)
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val rank = math.max(1L, math.ceil(q * sorted.size).toLong)
      assert(got(q) == ((rank, sorted((rank - 1).toInt))),
        s"q=$q: got ${got(q)}, want rank $rank -> ${sorted((rank - 1).toInt)}")
    }
    // q=1.0 is the max; a tiny frame (fewer rows than partitions) still works
    val tiny = Seq(3.0, 1.0, 2.0).toDF("v")
    val t = Freq.exactQuantiles(tiny, "v", Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(t == Map(0.5 -> 2.0, 1.0 -> 3.0))
    intercept[IllegalArgumentException] { Freq.exactQuantiles(tiny, "v", Seq()) }
    intercept[IllegalArgumentException] { Freq.exactQuantiles(tiny, "v", Seq(0.0)) }
    intercept[IllegalArgumentException] { Freq.exactQuantiles(tiny, "v", Seq(0.5, 0.5)) }
  }
}
