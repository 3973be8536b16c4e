package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // queries are independent: run them on a small pool so Spark schedules
    // several jobs concurrently (local[N] has idle cores during the many
    // tiny-stage queries; ~2-3x faster wall clock than sequential).
    // prep() is synchronized and each query writes its own directory.
    val threads = sys.env.get("SPARK_GRAFT_VERIFY_THREADS")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(4)
    // daemon threads + finally-shutdown: a failure mid-drive must exit the
    // JVM with the error, never hang the harness on idle pool threads
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads,
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    // local-iteration subset: comma-separated query-name prefixes; the
    // driver leaves it unset and always runs the full contract
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(ps) => SparkEntry.queries.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    // failed queries are recorded in _verify_errors.json, not just
    // stderr: a query that errors otherwise simply VANISHES from the
    // driver's correctness file (fewer rows, zero err entries), which is
    // how the round-10 events regeneration silently dropped six queries
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    try {
      val tasks = selected.toSeq.map { case (name, fn) =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            catch { case e: Throwable =>
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
              failures.add((name, String.valueOf(e.getMessage)))
            }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles = only match {
      case Some(ps) => SparkEntry.oracleSql.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => SparkEntry.oracleSql
    }
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    import scala.jdk.CollectionConverters._
    val errJson = failures.asScala
      .map { case (n, m) => s"${q(n)}: ${q(m)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_verify_errors.json"), errJson)
    if (!failures.isEmpty)
      System.err.println(s"[verify] ${failures.size} of ${selected.size} " +
        s"queries FAILED: ${failures.asScala.map(_._1).mkString(", ")}")
    spark.stop()
  }
}
