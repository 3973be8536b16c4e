package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: print the post-execution adaptive plan of one
  * contract query to check exchange/stage reuse. Run manually:
  * `sbt "Test/runMain graft.tools.PlanPeek q142_ccnet_buckets"`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q142_ccnet_buckets"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("plan-peek").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    df.collect()
    val tRun = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    df.collect()
    val tRun2 = (System.nanoTime() - t2) / 1e9
    println(s"=== $name build=${tBuild}s run=${tRun}s warm=${tRun2}s")
    val s = df.queryExecution.executedPlan.toString
    println(s.take(6000))
    println("... REUSE NODES: " + s.linesIterator.filter(l =>
      l.contains("Reused") || l.contains("TableCacheQueryStage")).mkString(" | ").take(2000))
    spark.stop()
  }
}
