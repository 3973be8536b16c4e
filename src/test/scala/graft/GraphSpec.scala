package graft

import graft.operators.Graph
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PageRank: engine result vs an independent driver-side reference
  * implementing the same rz6 update law, plus the analytic fixed
  * points (cycles, dangling redistribution, zero iterations). */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graph-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rz6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  /** Independent reference: same update law, plain Scala collections. */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toDouble
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size }
    var r = nodes.map(_ -> rz6(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val dang = rz6(nodes.filterNot(deg.contains).map(r).sum)
      val cs = e.groupBy(_._2).map { case (dst, es) =>
        dst -> rz6(es.map(x => rz6(r(x._1) / deg(x._1))).sum)
      }
      r = nodes.map(v => v -> rz6(rz6((1.0 - d) / n) +
        d * (cs.getOrElse(v, 0.0) + rz6(dang / n)))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val sp = spark
    import sp.implicits._
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("two-node cycle is the uniform fixed point") {
    val out = run(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(out == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("zero iterations returns the uniform vector") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)), iters = 0)
    assert(out.values.toSet == Set(rz6(1.0 / 3)))
  }

  test("dangling sink redistributes and the sink outranks its feeder") {
    // 1 -> 3, 2 -> 3; 3 dangles
    val out = run(Seq((1L, 3L), (2L, 3L)), iters = 8)
    assert(out(3L) > out(1L))
    assert(out(1L) == out(2L), "symmetric feeders must tie exactly")
    // mass stays ~1 (dangling redistribution, up to rounding)
    assert(math.abs(out.values.sum - 1.0) < 1e-3)
  }

  test("engine matches the independent reference rank-for-rank on a dense fixture") {
    val edges = for {
      i <- 0L until 30L
      j <- Seq((i * 7 + 3) % 30, (i * 13 + 1) % 30, (i * 5 + 11) % 30)
      if j != i
    } yield (i, j)
    for (iters <- Seq(1, 4, 7)) {
      val got = run(edges, iters)
      val want = ref(edges, iters)
      assert(got == want, s"divergence at iters=$iters")
    }
  }

  test("duplicate edges collapse to link-once semantics") {
    val once = run(Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)), 4)
    val duped = run(Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L),
      (3L, 1L), (3L, 1L)), 4)
    assert(once == duped)
  }

  test("parameter validation") {
    val sp = spark
    import sp.implicits._
    val e = Seq((1L, 2L)).toDF("s", "d")
    intercept[IllegalArgumentException] { Graph.pageRank(e, "s", "d", -1) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, "s", "d", 1, damping = 1.0) }
  }

  test("hopDistance: BFS truth, horizon nulls, zero hops = seeds only") {
    val sp = spark
    import sp.implicits._
    // a path 0-1-2-3-4-5 plus an island 10-11
    val raw = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    def run(seeds: Seq[Long], hops: Int): Map[Long, Option[Long]] =
      Graph.hopDistance(raw.toDF("s", "d"), "s", "d",
          seeds.toDF("p"), "p", hops)
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
    assert(run(Seq(0L), 3) == Map(
      0L -> Some(0L), 1L -> Some(1L), 2L -> Some(2L), 3L -> Some(3L),
      4L -> None, 5L -> None, 10L -> None, 11L -> None))
    assert(run(Seq(0L), 0) == Map(
      0L -> Some(0L), 1L -> None, 2L -> None, 3L -> None,
      4L -> None, 5L -> None, 10L -> None, 11L -> None))
    // two seeds race: min distance wins; seed not in the graph ignored
    assert(run(Seq(5L, 10L, 999L), 2) == Map(
      0L -> None, 1L -> None, 2L -> None, 3L -> Some(2L),
      4L -> Some(1L), 5L -> Some(0L), 10L -> Some(0L), 11L -> Some(1L)))
    intercept[IllegalArgumentException] {
      Graph.hopDistance(raw.toDF("s", "d"), "s", "d", Seq(0L).toDF("p"), "p", -1)
    }
  }

  test("labelPropagation matches a driver reference; cliques converge to min id") {
    val sp = spark
    import sp.implicits._
    // two 5-cliques bridged by one edge + a random tail
    val clique = (g: Seq[Long]) =>
      for { a <- g; b <- g if a < b } yield (a, b)
    val rnd = new scala.util.Random(41)
    val tail = (0 until 60).map(_ => (20L + rnd.nextInt(12), 20L + rnd.nextInt(12)))
    val raw = clique(Seq(1L, 2L, 3L, 4L, 5L)) ++ clique(Seq(11L, 12L, 13L, 14L, 15L)) ++
      Seq((5L, 11L)) ++ tail
    def reference(iters: Int): Map[Long, Long] = {
      val und = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
      var lbl = adj.keys.map(v => v -> v).toMap
      for (_ <- 1 to iters) lbl = adj.map { case (v, ns) =>
        val votes = ns.map(lbl).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        v -> votes.toSeq.maxBy { case (l, c) => (c.toLong, -l) }._1
      }
      lbl
    }
    Seq(0, 1, 4).foreach { it =>
      val got = Graph.labelPropagation(raw.toDF("s", "d"), "s", "d", it)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == reference(it), s"iters=$it")
    }
    // the clique structure: after 4 rounds each 5-clique shares one label
    val got4 = Graph.labelPropagation(raw.toDF("s", "d"), "s", "d", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(got4).distinct.size == 1)
    assert(Seq(12L, 13L, 14L, 15L).map(got4).distinct.size == 1)
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(raw.toDF("s", "d"), "s", "d", -1)
    }
  }

  test("kCore: peeling matches brute force; chains fall off, cliques survive") {
    val sp = spark
    import sp.implicits._
    // K4 on {1,2,3,4} + a pendant chain 4-10-11-12 + a triangle {20,21,22}
    // attached to the clique via one edge 1-20, with dupes/reversals
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 10L), (10L, 11L), (11L, 12L), (12L, 11L), // reversed dup
      (20L, 21L), (21L, 22L), (20L, 22L), (1L, 20L), (2L, 2L)) // self-loop
    def brute(k: Int, rounds: Int): Map[Long, Long] = {
      var e = edges.filter(t => t._1 != t._2)
        .map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).distinct
      (1 to rounds).foreach { _ =>
        val deg = e.flatMap(t => Seq(t._1, t._2)).groupBy(identity)
          .map { case (v, xs) => v -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        e = e.filter(t => keep(t._1) && keep(t._2))
      }
      e.flatMap(t => Seq(t._1, t._2)).groupBy(identity)
        .map { case (v, xs) => v -> xs.size.toLong }
    }
    for ((k, rounds) <- Seq((2, 1), (2, 3), (3, 1), (3, 3), (4, 2))) {
      val got = Graph.kCore(edges.toDF("s", "d"), "s", "d", k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == brute(k, rounds), s"k=$k rounds=$rounds: $got vs ${brute(k, rounds)}")
    }
    // converged 3-core: exactly the K4 (node 1's edge to 20 dies with
    // the triangle — 20/21/22 have degree 2 < 3 and peel off first)
    val core3 = Graph.kCore(edges.toDF("s", "d"), "s", "d", k = 3, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core3 == Set((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)), s"$core3")
    intercept[IllegalArgumentException] {
      Graph.kCore(edges.toDF("s", "d"), "s", "d", k = 0, rounds = 1)
    }
  }

  test("triangleStats matches brute force; hub, self-loops, reversed dupes") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(31)
    val base = (0 until 600).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    // hub 99 wired to everyone, plus self-loops and reversed duplicates
    val raw = base ++ (0L until 40L).map(v => (99L, v)) ++
      Seq((5L, 5L), (17L, 17L)) ++ base.take(150).map(_.swap)
    val got = Graph.triangleStats(raw.toDF("s", "d"), "s", "d")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // brute force over the canonical simple graph
    val und = raw.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct.toSet
    val verts = und.flatMap(e => Seq(e._1, e._2))
    val adj = verts.map(v => v -> und.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }).toMap
    assert(got.keySet == verts)
    verts.foreach { v =>
      val nbrs = adj(v).toSeq.sorted
      val d = nbrs.size.toLong
      val t = nbrs.combinations(2).count { case Seq(x, y) => und((x, y)) }.toLong
      val lcc = if (d >= 2) rz6(2.0 * t / (d * (d - 1))) else 0.0
      assert(got(v) == ((d, t, lcc)), s"vertex $v: got ${got(v)}, brute ($d,$t,$lcc)")
    }
  }
}
