package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone replay of ScaleSmoke's NavGraph build/append/search lane
  * (same fixtures, sizes, and parameters) so the r21 edge row-group
  * prune's search slope can be measured without running the whole
  * smoke. Prints the same [scale] lines; asserts nothing — the gate
  * assertions live in ScaleSmoke. */
object NavLane {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GeoFunctions.register(spark)
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // bounded cooldown before every timed section: the lane self-heats
    // (each build pushes the 1-min average past 20 on an idle box), and
    // single-shot samples taken in that heat read 2-7x quiet numbers
    def coolDown(): Unit = {
      val t0 = System.nanoTime()
      while (loadavg() > 16.0 && (System.nanoTime() - t0) / 1e9 < 180) {
        println(f"[navlane] cooldown: loadavg ${loadavg()}%.1f")
        Thread.sleep(10000)
      }
    }
    def time[T](name: String)(f: => T): (T, Double) = {
      coolDown()
      val ld = loadavg()
      println(f"[navlane] start '$name' at loadavg $ld%.1f")
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name: $s%.2f s")
      (r, s)
    }
    val vecs = spark.range(100000L).selectExpr("id AS vec_id",
      "transform(sequence(0, 63), d -> CAST(sin(id * 1.7 + d * 0.13) AS FLOAT)) AS embedding")
      .repartition(32).cache()
    vecs.count()
    val path = java.nio.file.Files.createTempDirectory("navlane").toString + "/idx"
    time("navGraph build 100k vectors (nlist=256, nProbe=4, m=16, 4 levels)") {
      graft.operators.NavGraph.buildNavGraph(vecs, path, m = 16,
        maxLevel = 3, nlist = 256, nProbe = 4, iters = 3)
    }
    def appendBatch(p: String, nl: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.NavGraph.appendToNavGraph(spark,
        p, spark.range(100000L, 105000L).selectExpr("id AS vec_id",
          "transform(sequence(0, 63), d -> CAST(sin(id * 1.7 + d * 0.13) AS FLOAT)) AS embedding"),
        nlist = nl, nProbe = 4, iters = 3)
      (System.nanoTime() - t0) / 1e9
    }
    coolDown()
    val app100k = math.min(appendBatch(path, 256), appendBatch(path, 256))
    println(f"[scale]   navGraph append 5k into 100k: $app100k%.2f s")
    val path3 = java.nio.file.Files.createTempDirectory("navlane3").toString + "/idx"
    val vecs3 = spark.range(300000L).selectExpr("id AS vec_id",
      "transform(sequence(0, 63), d -> CAST(sin(id * 1.7 + d * 0.13) AS FLOAT)) AS embedding")
      .repartition(32).cache()
    vecs3.count()
    time("navGraph build 300k vectors (nlist=1024, nProbe=4, m=16, 4 levels)") {
      graft.operators.NavGraph.buildNavGraph(vecs3, path3, m = 16,
        maxLevel = 3, nlist = 1024, nProbe = 4, iters = 3)
    }
    coolDown()
    val app300k = math.min(appendBatch(path3, 1024), appendBatch(path3, 1024))
    println(f"[scale]   navGraph append 5k into 300k: $app300k%.2f s " +
      f"(${app300k / app100k}%.2fx the 100k append at 3x corpus)")
    vecs3.unpersist()
    // min-of-2 per side: the smoke's single cold sample is
    // load-sensitive (the r20 ADVICE note)
    def searchOn(p: String, qs: org.apache.spark.sql.DataFrame): Double =
      (1 to 2).map { _ =>
        coolDown()
        val t0 = System.nanoTime()
        graft.operators.NavGraph.navSearch(spark, p, qs, k = 10, ef = 32,
          rounds = 2).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    val s100 = searchOn(path, vecs.where(col("vec_id") % 500 === 7))
    println(f"[scale]   navGraph search 200 queries on 100k graph: $s100%.2f s (min of 2)")
    val q300 = spark.range(300000L).selectExpr("id AS vec_id",
      "transform(sequence(0, 63), d -> CAST(sin(id * 1.7 + d * 0.13) AS FLOAT)) AS embedding")
      .where(col("vec_id") % 1500 === 7)
    val s300 = searchOn(path3, q300)
    println(f"[scale]   navGraph search at 3x corpus: $s300%.2f s " +
      f"(${s300 / s100}%.2fx the 100k search)")
    val rec = graft.operators.NavGraph.navRecallFrame(spark, path,
      vecs.where(col("vec_id") % 2000 === 7), k = 10, ef = 32, rounds = 2)
      .collect()(0)
    println(s"[scale]   nav recall@10 (100k): ${rec.getDouble(2)} (${rec.getLong(1)}/${rec.getLong(0)})")
    val rec3 = graft.operators.NavGraph.navRecallFrame(spark, path3,
      q300.where(col("vec_id") % 2 === 1), k = 10, ef = 32, rounds = 2)
      .collect()(0)
    println(s"[scale]   nav recall@10 (300k): ${rec3.getDouble(2)} (${rec3.getLong(1)}/${rec3.getLong(0)})")
    spark.stop()
  }
}
