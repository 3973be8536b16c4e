package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Persisted dedup-cluster registry (Dedup.writeRegistry family) and the
  * classifier calibration profile (TextAnalysis.calibrationProfile). */
class RegistryCalibrationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("reg").toString + "/idx"

  test("registry: appends + retry + compact cluster like one-shot CC") {
    val sp = spark
    import sp.implicits._
    // two separate star components plus a bridge arriving in a later
    // batch: the registry must MERGE clusters across batches
    val b1 = Seq((1L, 2L), (1L, 3L), (10L, 11L)).toDF("x", "y")
    val b2 = Seq((11L, 12L), (3L, 10L)).toDF("x", "y") // bridge 3-10
    val path = scratch()
    graft.operators.Dedup.writeRegistry(b1, "x", "y", path, buckets = 4)
    graft.operators.Dedup.appendToRegistry(spark, path, b2, "x", "y")
    graft.operators.Dedup.appendToRegistry(spark, path, b2, "x", "y") // retry
    def clusters() = graft.operators.Dedup.registryClusters(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 1L, 11L -> 1L, 12L -> 1L)
    assert(clusters() == expect, "bridge batch must merge the components")
    graft.operators.Dedup.compactRegistry(spark, path)
    assert(clusters() == expect, "compaction changed the clusters")
    // compaction folded the log: distinct edges only, 1 file per bucket
    val dataDir = graft.util.FsIO.indexDataDir(spark, path)
    val edges = spark.read.parquet(s"$dataDir/edges")
    assert(edges.count() == edges.distinct().count())
    val perPt = new java.io.File(s"$dataDir/edges").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("pt="))
      .map(_.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet")))
    assert(perPt.nonEmpty && perPt.forall(_ == 1), s"not folded: ${perPt.toSeq}")
  }

  test("cluster snapshot: delta refresh == full CC; re-refresh is a no-op") {
    val sp = spark
    import sp.implicits._
    // batch 1: two components {1,2,3} and {10,11}; batch 2 bridges them
    // and introduces a brand-new pair {50,51}; batch 3 replays batch 2
    val b1 = Seq((1L, 2L), (1L, 3L), (10L, 11L)).toDF("x", "y")
    val b2 = Seq((11L, 12L), (3L, 10L), (50L, 51L)).toDF("x", "y")
    val reg = scratch()
    val snap = scratch()
    graft.operators.Dedup.writeRegistry(b1, "x", "y", reg)
    graft.operators.Dedup.writeClusterSnapshot(spark, reg, snap)
    def clusters() = graft.operators.Dedup.readClusterSnapshot(spark, snap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters() == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    graft.operators.Dedup.appendToRegistry(spark, reg, b2, "x", "y")
    graft.operators.Dedup.refreshClusterSnapshot(spark, snap, b2, "x", "y")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      12L -> 1L, 50L -> 50L, 51L -> 50L)
    assert(clusters() == expect, "delta refresh must merge across the bridge")
    // the incremental map equals the full CC over the grown registry
    val full = graft.operators.Dedup.registryClusters(spark, reg)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters() == full)
    // replaying the same delta (a foreachBatch retry) is a strict no-op:
    // no new delta dirs, same clusters
    def deltaDirs() = new java.io.File(
        graft.util.FsIO.indexDataDir(spark, snap)).listFiles()
      .map(_.getName).filter(n => n.startsWith("new_d") || n.startsWith("remap_d"))
      .sorted.toSeq
    val before = deltaDirs()
    graft.operators.Dedup.refreshClusterSnapshot(spark, snap, b2, "x", "y")
    assert(clusters() == expect)
    assert(deltaDirs() == before, "a replayed delta must write nothing")
    // the refresh APPENDED batch-sized deltas into v1 - no base rewrite,
    // no publish (that is the whole point of the delta layout)
    assert(graft.util.FsIO.indexDataDir(spark, snap).endsWith("v1"))
    assert(before.exists(_.startsWith("remap_d")) &&
      before.exists(_.startsWith("new_d")), s"expected delta dirs: $before")
    // compaction folds base + deltas into v2; read-identical
    graft.operators.Dedup.compactClusterSnapshot(spark, snap)
    assert(graft.util.FsIO.indexDataDir(spark, snap).endsWith("v2"))
    assert(deltaDirs().isEmpty, "compaction must fold the deltas away")
    assert(clusters() == expect, "compaction changed the clusters")
  }

  test("calibration: clamped bins, exact per-bin laws, ECE") {
    val sp = spark
    import sp.implicits._
    // scores outside [0,1] clamp into the edge bins; a perfectly
    // calibrated two-bin fixture has gap 0 in one bin
    val rows = Seq(
      (-0.5, false), (0.1, false), (0.1, false), (0.1, false), (0.1, true),
      (0.9, true), (0.9, true), (0.9, true), (0.9, false), (1.7, true))
      .toDF("score", "y")
    val got = graft.operators.TextAnalysis
      .calibrationProfile(rows, "score", "y", bins = 2)
      .orderBy("bin").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(0, 1), "clamping must land edge bins")
    val bin0 = got(0)
    // bin0: scores {-0.5, .1 x4} -> mean (-0.5 + 0.4)/5 = -0.02; 1 of 5 pos
    assert(bin0.getLong(1) == 5L)
    assert(math.abs(bin0.getDouble(2) - (-0.02)) < 1e-9)
    assert(math.abs(bin0.getDouble(3) - 0.2) < 1e-9)
    val bin1 = got(1)
    // bin1: {0.9 x4, 1.7} -> mean 1.06; 4 of 5 pos -> gap 0.26
    assert(math.abs(bin1.getDouble(2) - 1.06) < 1e-9)
    assert(math.abs(bin1.getDouble(3) - 0.8) < 1e-9)
    assert(math.abs(bin1.getDouble(4) - 0.26) < 1e-9)
    // ece = (5*0.22 + 5*0.26)/10 = 0.24, identical on every row
    assert(got.map(_.getDouble(5)).distinct.toSeq == Seq(0.24))
  }

  test("calibration: NULL scores are dropped, never an ECE-deflating NULL bin") {
    val sp = spark
    import sp.implicits._
    val base = Seq(
      (Some(0.1), false), (Some(0.1), true), (Some(0.9), true), (Some(0.9), true))
    val withNulls = base ++ Seq((Option.empty[Double], true),
      (Option.empty[Double], false))
    val clean = graft.operators.TextAnalysis
      .calibrationProfile(base.toDF("score", "y"), "score", "y", bins = 2)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    val dirty = graft.operators.TextAnalysis
      .calibrationProfile(withNulls.toDF("score", "y"), "score", "y", bins = 2)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    assert(dirty == clean,
      "NULL scores must not add a bin row or shift any bin stat or the ECE")
  }
}
