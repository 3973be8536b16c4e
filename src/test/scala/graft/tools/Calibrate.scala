package graft.tools

import graft.functions.GeoFunctions
import graft.operators.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline calibration harness (test scope, not shipped): measures the
  * deterministic ANN recall of the contract configurations at each local
  * scale factor so the q31/q35 oracle thresholds are set from measured
  * values with margin, not guesses. Run:
  *   sbt "Test/runMain graft.tools.Calibrate"
  */
object Calibrate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GeoFunctions.register(spark)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val queries = emb.where(col("vec_id") < 5)
      val exact = Ann.bruteForceTopK(queries, emb, 3).cache()
      val nExact = exact.count()
      for ((np, pr) <- Seq((6, 10), (6, 15), (8, 15), (8, 23), (4, 7))) {
        val approx = Ann.lshTopK(queries, emb, 3, nPlanes = np, nProbe = pr)
        val r = Ann.recall(approx, exact)
        println(f"[$sf] LSH nPlanes=$np nProbe=$pr recall=$r%.3f (n=$nExact)")
      }
      for ((nl, pr) <- Seq((8, 4), (8, 3), (16, 6))) {
        val approx = Ann.ivfTopK(queries, emb, 3, nlist = nl, nProbe = pr)
        val r = Ann.recall(approx, exact)
        println(f"[$sf] IVF nlist=$nl nProbe=$pr recall=$r%.3f")
      }
    }
    spark.stop()
  }
}
