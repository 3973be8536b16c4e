package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10x scale-up of a driver sf0.1 testdata directory, for the bench's
  * sf1 scale-linearity tier (correctness still runs ONLY on driver
  * parquet — this data is never oracled, only timed).
  *
  * Fact tables are replicated 10x with per-replica perturbations chosen
  * so the WORKLOAD scales linearly rather than degenerately:
  *  - key columns shift by a replica offset (so elections, joins and
  *    windows keyed on them keep their per-key cardinality instead of
  *    10x-ing it);
  *  - document text goes through a per-replica alphabet rotation
  *    (`translate`) — same length, same token/paragraph structure, but
  *    disjoint shingle/token universes, so dedup bucket sizes and
  *    posting lists stay at their sf0.1 profile while the corpus grows
  *    10x. Plain replication would square the in-bucket pair counts
  *    (every doc gains 10 exact copies) and measure a blow-up no real
  *    10x corpus has.
  * Dimension tables copy through unchanged (TPC-H scales them too, but
  * no headline query's cost is driven by a dimension).
  *
  * The l_orderkey offset is a multiple of 100 so the synthesized point
  * coordinates (l_orderkey % 100) keep their exact value distribution.
  */
object Sf1Data {

  private val Reps = 10
  private val lower = "abcdefghijklmnopqrstuvwxyz"

  private def rot(s: String, i: Int): String = s.drop(i % s.length) + s.take(i % s.length)

  /** Per-replica substitution cipher: length- and structure-preserving,
    * shingle-disjoint across replicas (identity for replica 0). */
  private def cipher(c: Column, i: Int): Column =
    if (i == 0) c
    else translate(c, lower + lower.toUpperCase, rot(lower, i) + rot(lower, i).toUpperCase)

  /** Build (or reuse) the scaled directory; returns its path. The cache
    * is keyed by a marker file — delete the directory to force a
    * rebuild after a driver testdata regeneration. */
  def ensure(spark: SparkSession, srcDir: String,
      dst: String = "/tmp/graft_sf1"): String = {
    val marker = new java.io.File(dst, "_GRAFT_SF1_OK")
    if (marker.exists()) return dst

    val par = spark.sparkContext.defaultParallelism

    def write(t: String, out: DataFrame): Unit =
      out.repartition(par).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    def replicated(t: String)(tf: (DataFrame, Int) => DataFrame): Unit = {
      val src = spark.read.parquet(s"$srcDir/$t.parquet")
      write(t, (0 until Reps).map(i => tf(src, i)).reduce(_ union _))
    }

    replicated("lineitem")((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
    replicated("orders")((df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
    replicated("events")((df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * 1000000000000L))
        .withColumn("user_id", col("user_id") + lit(i * 1000000000L)))
    replicated("documents")((df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * 1000000000L))
        .withColumn("text", cipher(col("text"), i)))
    replicated("embeddings")((df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(t, spark.read.parquet(s"$srcDir/$t.parquet"))
    }

    marker.createNewFile()
    dst
  }
}
