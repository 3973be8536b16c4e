package graft

import graft.operators.{AsofJoin, IntervalJoin, Sessionize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** As-of join, interval joins, and sessionization vs brute-force truth on
  * randomized fixtures (seeded — deterministic), plus plan-shape asserts:
  * the binned joins must plan as equi-joins, never a nested loop. */
class TemporalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def events(n: Int, keys: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, rnd.nextInt(keys).toLong, rnd.nextInt(1000).toLong))
  }

  test("asofBackward matches per-row brute force (inclusive)") {
    import spark.implicits._
    val l = events(300, 5, 1).map { case (i, k, t) => (i, k, t * 200) }
      .toDF("lid", "k", "ts")
    // right ts made globally unique by construction (folds in the distinct
    // row index) so the brute-force compare has no tie ambiguity
    val r = events(200, 5, 2).map { case (i, k, t) => (i + 1000, k, t * 200 + i) }
      .toDF("rid", "k", "ts")
    val got = AsofJoin.asofBackward(l, r, "k", "ts", Seq("rid"))
      .select("lid", "asof_rid", "asof_ts").collect()
      .map(row => (row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getLong(1)),
        if (row.isNullAt(2)) None else Some(row.getLong(2)))).toSet
    val rRows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val want = l.collect().map { x =>
      val (lid, k, ts) = (x.getLong(0), x.getLong(1), x.getLong(2))
      // (ts, rid) max: rid tiebreak is arbitrary in the operator, but this
      // fixture has no (k, ts) dupes on the right by construction check
      val c = rRows.filter(rr => rr._2 == k && rr._3 <= ts)
      if (c.isEmpty) (lid, None, None)
      else {
        val best = c.maxBy(_._3)
        (lid, Some(best._1), Some(best._3))
      }
    }.toSet
    // ensure the tiebreak-free premise actually holds for the seed
    assert(rRows.groupBy(rr => (rr._2, rr._3)).forall(_._2.length == 1))
    assert(got == want)
  }

  test("inclusive vs exclusive at equal timestamps; tolerance nulls stale") {
    import spark.implicits._
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "ts")
    val r = Seq((10L, 1L, 100L), (11L, 1L, 40L)).toDF("rid", "k", "ts")
    val incl = AsofJoin.asofBackward(l, r, "k", "ts", Seq("rid")).head()
    assert(incl.getAs[Long]("asof_rid") == 10L && incl.getAs[Long]("asof_ts") == 100L)
    val excl = AsofJoin.asofBackward(l, r, "k", "ts", Seq("rid"), inclusive = false).head()
    assert(excl.getAs[Long]("asof_rid") == 11L && excl.getAs[Long]("asof_ts") == 40L)
    // exclusive match is 60 old; tolerance 50 nulls it
    val tol = AsofJoin.asofBackward(l, r, "k", "ts", Seq("rid"), inclusive = false,
      tolerance = Some(50L)).head()
    assert(tol.isNullAt(tol.fieldIndex("asof_rid")) && tol.isNullAt(tol.fieldIndex("asof_ts")))
  }

  test("asofBackward carries the WHOLE matched row: null values stay null, null ts unmatched") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rschema = StructType(Seq(StructField("rid", LongType),
      StructField("k", LongType), StructField("ts", LongType),
      StructField("v", StringType)))
    import spark.implicits._
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "ts")
    // latest right row (ts=50) has v=NULL; an older one (ts=10) has v="old";
    // a null-ts right row with a value must be invisible
    val r = spark.createDataFrame(java.util.Arrays.asList(
      Row(10L, 1L, 10L, "old"), Row(11L, 1L, 50L, null),
      Row(12L, 1L, null, "ghost")), rschema)
    val row = AsofJoin.asofBackward(l, r, "k", "ts", Seq("v", "rid")).head()
    // the match is the ts=50 row: its NULL v must NOT be replaced by "old"
    assert(row.getAs[Long]("asof_ts") == 50L)
    assert(row.getAs[Long]("asof_rid") == 11L)
    assert(row.isNullAt(row.fieldIndex("asof_v")))
  }

  test("asofBackward with no qualifying right row yields nulls, keeps all left rows") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L), (2L, 2L, 10L)).toDF("lid", "k", "ts")
    val r = Seq((9L, 1L, 50L)).toDF("rid", "k", "ts") // future-only, wrong key
    val rows = AsofJoin.asofBackward(l, r, "k", "ts", Seq("rid")).collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(rows.head.fieldIndex("asof_rid"))))
  }

  test("asofBackward: null keys match nothing (equi-join semantics), negative tolerance rejected") {
    import spark.implicits._
    val l = Seq((1L, Option(7L), 100L), (2L, Option.empty[Long], 100L))
      .toDF("lid", "k", "ts")
    val r = Seq((Option(7L), 50L, "real"), (Option.empty[Long], 50L, "ghost"))
      .toDF("k", "ts", "v")
    val got = AsofJoin.asofBackward(l, r, "k", "ts", Seq("v"))
      .orderBy("lid").collect()
      .map(row => (row.getLong(0), Option(row.getAs[String]("asof_v"))))
    // the null-key left row is PRESERVED but matches nothing — it must
    // not pick up the null-key right row's value
    assert(got.toSeq == Seq((1L, Some("real")), (2L, None)))
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(l, r, "k", "ts", Seq("v"), tolerance = Some(-1L))
    }
  }

  test("binned joins: non-finite values are excluded, bad binSize rejected") {
    import spark.implicits._
    val pts = Seq((1L, 5.0), (2L, Double.NaN), (3L, Double.PositiveInfinity))
      .toDF("pid", "x")
    val ivs = Seq((10L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    // NaN/Inf POINTS drop out instead of killing the job at the ANSI
    // cast — exactly the raw predicate's behavior against finite
    // intervals; the finite point still joins the finite interval
    val got = IntervalJoin.rangeJoin(pts, "x", ivs, "lo", "hi", binSize = 5.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
    intercept[IllegalArgumentException] {
      IntervalJoin.rangeJoin(pts, "x", ivs, "lo", "hi", binSize = 0.0)
    }
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(ivs, "lo", "hi",
        ivs.toDF("iid2", "lo2", "hi2"), "lo2", "hi2", binSize = Double.NaN)
    }
  }

  test("binned joins: non-finite interval bounds fail loudly, null bounds drop") {
    import spark.implicits._
    val pts = Seq((1L, 5.0)).toDF("pid", "x")
    // a semi-infinite interval WOULD match under the raw predicate —
    // silently dropping it loses matches, so the operator must throw
    val unbounded = Seq((11L, Double.NegativeInfinity, 1.0))
      .toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      IntervalJoin.rangeJoin(pts, "x", unbounded, "lo", "hi", binSize = 5.0).collect()
    }
    assert(ex.getMessage.contains("finite") ||
      Option(ex.getCause).exists(_.getMessage.contains("finite")))
    intercept[Exception] {
      IntervalJoin.overlapJoin(
        Seq((1L, 0.0, 2.0)).toDF("aid", "alo", "ahi"), "alo", "ahi",
        Seq((2L, 1.0, Double.PositiveInfinity)).toDF("bid", "blo", "bhi"),
        "blo", "bhi", binSize = 1.0).collect()
    }
    // NULL bounds are never-matching under the raw predicate → dropped
    val withNull = Seq((10L, Some(0.0), Some(10.0)), (12L, None, Some(3.0)))
      .toDF("iid", "lo", "hi")
    val got = IntervalJoin.rangeJoin(pts, "x", withNull, "lo", "hi", binSize = 5.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("sessionize: negative gap rejected") {
    import spark.implicits._
    val df = Seq((1L, 10L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      Sessionize.assignSessions(df, "k", "ts", gap = -1L)
    }
  }

  test("sessionize: gap boundaries, counts, and span invariants") {
    import spark.implicits._
    // key 1: ts 0,10,20 | 100,105 | 300  (gap 30) → 3 sessions
    val df = Seq((1L, 0L), (1L, 10L), (1L, 20L), (1L, 100L), (1L, 105L), (1L, 300L),
      (2L, 5L)).toDF("k", "ts")
    val stats = Sessionize.sessionStats(df, "k", "ts", gap = 30L)
      .orderBy("k", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(stats.toSeq == Seq(
      (1L, 1L, 3L, 0L, 20L), (1L, 2L, 2L, 100L, 105L), (1L, 3L, 1L, 300L, 300L),
      (2L, 1L, 1L, 5L, 5L)))
    // invariant on random data: within a session consecutive gaps <= gap,
    // across consecutive sessions the gap > gap
    val rnd = events(500, 3, 7).toDF("id", "k", "ts").dropDuplicates("k", "ts")
    val assigned = Sessionize.assignSessions(rnd, "k", "ts", gap = 40L)
      .select("k", "ts", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assigned.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, t1, s1), (_, t2, s2)) =>
          if (s1 == s2) assert(t2 - t1 <= 40L)
          else { assert(s2 == s1 + 1); assert(t2 - t1 > 40L) }
        case _ =>
      }
    }
  }

  test("sessionize: null-timestamp rows are dropped, not singleton sessions") {
    import spark.implicits._
    // two null-ts rows interleaved with a normal timeline; the contract
    // (Sessionize scaladoc) is DROP — they must neither appear in the
    // output nor perturb the session numbering of the real rows
    val df = Seq((1L, Some(0L)), (1L, None), (1L, Some(10L)), (1L, Some(100L)),
      (1L, None), (2L, None)).toDF("k", "ts")
    val assigned = Sessionize.assignSessions(df, "k", "ts", gap = 30L)
      .select("k", "ts", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(assigned == Set((1L, 0L, 1L), (1L, 10L, 1L), (1L, 100L, 2L)))
    // a key whose every row is null-ts vanishes entirely
    val stats = Sessionize.sessionStats(df, "k", "ts", gap = 30L)
    assert(stats.where(col("k") === 2L).count() == 0)
  }

  test("trailingWindowStats: half-open [ts-w, ts) counts/sums match brute force") {
    import spark.implicits._
    val rows = events(400, 4, 21).map { case (i, k, t) => (i, k, t, i % 7 + 1) }
    val df = rows.toDF("id", "k", "ts", "v")
    val got = Sessionize.trailingWindowStats(df, "k", "ts", lookback = 100L,
        valueCol = Some("v")).select("id", "n_prev", "sum_prev").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { case (id, k, t, _) =>
      val prev = rows.filter(o => o._2 == k && o._3 >= t - 100 && o._3 < t)
      assert(got(id)._1 == prev.length, s"id $id count")
      assert(got(id)._2 == prev.map(_._4.toLong).sum, s"id $id sum")
    }
    // the current event itself is excluded (leakage-safety): an event with
    // no history has (0, 0), not (1, v)
    val lone = Seq((1L, 9L, 5L, 10)).toDF("id", "k", "ts", "v")
    val r0 = Sessionize.trailingWindowStats(lone, "k", "ts", 100L, Some("v")).head()
    assert(r0.getAs[Long]("n_prev") == 0L && r0.getAs[Long]("sum_prev") == 0L)
  }

  test("rangeJoin matches brute force, including negatives and bin edges") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (0 until 300).map(i => (i.toLong, rnd.nextInt(200) - 100.0)).toDF("pid", "x")
    val ivs = (0 until 80).map { i =>
      val lo = rnd.nextInt(200) - 100.0
      (i.toLong, lo, lo + rnd.nextInt(25))
    }.toDF("iid", "lo", "hi")
    val got = IntervalJoin.rangeJoin(pts, "x", ivs, "lo", "hi", binSize = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = for {
      (pid, x) <- pts.collect().map(r => (r.getLong(0), r.getDouble(1)))
      (iid, lo, hi) <- ivs.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      if x >= lo && x <= hi
    } yield (pid, iid)
    // multiset compare: no dedup pass exists, so accidental dupes would show
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("overlapJoin matches brute force exactly once per pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def mk(n: Int, tag: Int) = (0 until n).map { i =>
      val lo = rnd.nextInt(300) - 150.0
      (i.toLong + tag, lo, lo + rnd.nextInt(60))
    }
    val a = mk(120, 0).toDF("aid", "alo", "ahi")
    val b = mk(120, 1000).toDF("bid", "blo", "bhi")
    val got = IntervalJoin.overlapJoin(a, "alo", "ahi", b, "blo", "bhi", binSize = 20.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = for {
      (aid, alo, ahi) <- a.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      (bid, blo, bhi) <- b.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      if alo <= bhi && blo <= ahi
    } yield (aid, bid)
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("binned joins plan as equi-joins — no nested loop") {
    import spark.implicits._
    val pts = (0 until 10).map(i => (i.toLong, i.toDouble)).toDF("pid", "x")
    val ivs = (0 until 10).map(i => (i.toLong, i * 2.0, i * 2.0 + 5)).toDF("iid", "lo", "hi")
    val plan1 = IntervalJoin.rangeJoin(pts, "x", ivs, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    val plan2 = IntervalJoin.overlapJoin(ivs, "lo", "hi",
      ivs.toDF("iid2", "lo2", "hi2"), "lo2", "hi2", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan1.contains("BroadcastNestedLoop") && !plan1.contains("CartesianProduct"))
    assert(!plan2.contains("BroadcastNestedLoop") && !plan2.contains("CartesianProduct"))
  }

  test("asofForward mirrors backward: next-at-or-after, tolerance, null ts/key") {
    val left = spark.sql("""SELECT * FROM VALUES
      (1L, 'u', 100L), (2L, 'u', 250L), (3L, 'w', 100L),
      (4L, CAST(NULL AS STRING), 100L), (5L, 'u', CAST(NULL AS BIGINT))
      AS t(id, k, ts)""")
    val right = spark.sql("""SELECT * FROM VALUES
      ('u', 100L, 'a'), ('u', 200L, 'b'), ('u', 300L, 'c'),
      (CAST(NULL AS STRING), 50L, 'n') AS t(k, ts, v)""")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getString(3))).toMap
    val inc = m(graft.operators.AsofJoin.asofForward(left, right, "k", "ts", Seq("v")))
    assert(inc(1L) == "a")   // inclusive: equal ts matches
    assert(inc(2L) == "c")   // next at-or-after 250 is 300
    assert(inc(3L) == null)  // no rows for key w
    assert(inc(4L) == null && inc(5L) == null) // null key / null ts match nothing
    val exc = m(graft.operators.AsofJoin.asofForward(left, right, "k", "ts",
      Seq("v"), inclusive = false))
    assert(exc(1L) == "b")   // strictly after 100 is 200
    val tol = m(graft.operators.AsofJoin.asofForward(left, right, "k", "ts",
      Seq("v"), tolerance = Some(40L)))
    assert(tol(1L) == "a" && tol(2L) == null) // 300 is 50 > 40 into the future
  }

  test("funnel: greedy order matching, window gate, non-starters keep rows") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes in order within the window
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // u2 has b BEFORE its first a — greedy-from-earliest a(15) finds
      // no later b, so it stalls at step 1
      (2L, 5L, "b"), (2L, 15L, "a"), (2L, 12L, "c"),
      // u3 completes but overruns the window of 50
      (3L, 0L, "a"), (3L, 10L, "b"), (3L, 100L, "c"),
      // u4 only unrelated events
      (4L, 7L, "x"),
      // u5: same-timestamp cascade is allowed (>= semantics)
      (5L, 40L, "a"), (5L, 40L, "b"), (5L, 40L, "c"))
      .toDF("u", "ts", "e")
    val out = graft.operators.Sessionize
      .funnel(ev, "u", "ts", "e", Seq("a", "b", "c"), windowMax = 50L)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((3, 10L, 30L, true)))
    assert(out(2L) == ((1, 15L, 15L, false)), s"greedy stall wrong: ${out(2L)}")
    assert(out(3L) == ((3, 0L, 100L, false)), "window overrun must not complete")
    assert(out(4L) == ((0, -1L, -1L, false)), "non-starter must keep a row")
    assert(out(5L) == ((3, 40L, 40L, true)), "same-ts cascade must chain")
  }

  test("funnel: adversarial hot key + randomized brute force, no per-key buffering") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val names = Vector("a", "b", "c")
    // one bot key emitting 60k step events — the shape that OOMed a
    // collect_list formulation — plus 200 normal keys
    val hot = (0 until 60000).map(_ =>
      (0L, rnd.nextInt(100000).toLong, names(rnd.nextInt(3))))
    val normal = (1 to 200).flatMap(k => (0 to rnd.nextInt(7)).map(_ =>
      (k.toLong, rnd.nextInt(1000).toLong, Vector("a", "b", "c", "x")(rnd.nextInt(4)))))
    val all = hot ++ normal
    val df = graft.operators.Sessionize
      .funnel(all.toDF("u", "ts", "e"), "u", "ts", "e", names, windowMax = 1000000L)
    // the streaming fold must not materialize per-key arrays
    assert(!df.queryExecution.optimizedPlan.toString.contains("collect_list"),
      "funnel must not buffer a key's events into an array")
    val got = df.collect().map(r => r.getLong(0) ->
      (r.getInt(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // brute force: greedy-from-earliest over (ts, stepIdx)-sorted events
    val brute = all.groupBy(_._1).map { case (k, evs) =>
      val sorted = evs.filter(e => names.contains(e._3))
        .map(e => (e._2, names.indexOf(e._3))).sorted
      var step = 0; var t0 = -1L; var t = -1L
      sorted.foreach { case (ts, s) =>
        if (step < 3 && s == step && (step == 0 || ts >= t)) {
          if (step == 0) t0 = ts
          step += 1; t = ts
        }
      }
      k -> ((step, t0, t))
    }
    assert(got.size == brute.size)
    brute.foreach { case (k, exp) =>
      assert(got(k) == exp, s"key $k: got ${got(k)}, brute $exp")
    }
  }

  test("rollingActives matches brute-force trailing-window distinct; dense spine") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // sparse days (gaps!) so the dense spine has zero-activity days
    val rows = (0 until 400).map { _ =>
      (10L + rnd.nextInt(40) * 2, rnd.nextInt(25).toLong) // even days only
    }
    val df = rows.toDF("day", "k")
    val got = Sessionize.rollingActives(df, "day", "k", Seq(1, 7))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val grid = rows.distinct
    val lo = grid.map(_._1).min
    val hi = grid.map(_._1).max
    assert(got.keySet == (lo to hi).toSet, "spine must be dense over the span")
    (lo to hi).foreach { d =>
      val a1 = grid.collect { case (gd, k) if gd == d => k }.distinct.size
      val a7 = grid.collect { case (gd, k) if gd > d - 7 && gd <= d => k }
        .distinct.size
      assert(got(d) == ((a1.toLong, a7.toLong)), s"day $d: got ${got(d)}, brute ($a1,$a7)")
    }
    // odd days in the span exist with actives_1 == 0 (came only from spine)
    assert((lo to hi).exists(d => d % 2 == 1 && got(d)._1 == 0L))
    // contract guards
    intercept[IllegalArgumentException] {
      Sessionize.rollingActives(df, "day", "k", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sessionize.rollingActives(df, "day", "k", Seq(7, 7))
    }
    intercept[IllegalArgumentException] {
      Sessionize.rollingActives(df.withColumn("day", col("day").cast("double")),
        "day", "k", Seq(7))
    }
  }
}
