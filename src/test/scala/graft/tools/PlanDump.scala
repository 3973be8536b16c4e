package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-21 measurement harness: write `.explain("formatted")` of named
  * contract queries to plans/<tag>/<query>_<suffix>.txt, using the same
  * session shape as [[graft.Bench]] (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus), so the committed plan files describe exactly what
  * the bench times. Run:
  * `sbt "Test/runMain graft.tools.PlanDump before q189 q202 ..."`
  * Args: <suffix> <query-prefix>... ; SPARK_GRAFT_SF_DIR picks the data
  * dir (default sf0.1), PLAN_TAG the output dir (default plans/r21). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val prefixes = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("PLAN_TAG", "plans/r21")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        // the formatted INITIAL plan (what explain("formatted") prints),
        // plus the post-execution adaptive plan so Reused*/AQE shapes are
        // visible — both matter for exchange-count claims
        val initial = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        df.write.format("noop").mode("overwrite").save()
        val fin = df.queryExecution.executedPlan.toString
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
          s"== query: $name  data: $sfDir ==\n\n$initial\n\n== POST-EXECUTION ADAPTIVE PLAN ==\n\n$fin")
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
