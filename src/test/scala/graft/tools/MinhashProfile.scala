package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-timer for the q28 MinHash-LSH pipeline at sf0.1 vs the 10x
  * sf1 directory — the r17 verdict's watch item (q28 read 5.1x at 10x
  * data vs the 1.42x tier median, and was the largest b2b entry).
  * Separates the per-doc signature kernel (linear by construction)
  * from the bucket-group/pair/refine stages (occupancy-driven), so a
  * superlinear stage is attributable instead of guessed:
  *
  *   sig     — minhash_sig + band scatter, materialized (64·n rows)
  *   pairs   — (band, bucket) grouping + in-bucket pair explosion
  *   cands   — + (ida, idb) hit-count agg + minBandHits filter
  *   refine  — the full minhashNearDups (exact-Jaccard verify join)
  *
  * Run: sbt 'Test/runMain graft.tools.MinhashProfile'
  * (expects /tmp/graft_sf1 populated by a prior bench run). */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GeoFunctions.register(spark)

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[minhash] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for ((tag, dir) <- Seq(("sf0.1", "/root/testdata/sf0.1"),
                           ("sf1", "/tmp/graft_sf1"))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      println(s"[minhash] === $tag ($n docs) ===")
      // two passes per stage: first is the JIT/plan warm-up, second is
      // the number to read
      for (pass <- 1 to 2) {
        time(s"sig pass$pass") {
          graft.operators.Dedup.minhashBuckets(docs, "doc_id", "text",
            numHashes = 64, bands = 64).write.format("noop")
            .mode("overwrite").save()
        }
        val bucketStats = time(s"bucket-occupancy pass$pass") {
          graft.operators.Dedup.minhashBuckets(docs, "doc_id", "text",
              numHashes = 64, bands = 64)
            .groupBy("band", "bucket").count()
            .agg(count(lit(1)).as("n_buckets"), sum("count").as("rows"),
              max("count").as("max_occ"),
              sum(col("count") * (col("count") - 1) / 2).as("pairs_ub"))
            .collect()(0)
        }
        println(s"[minhash]   buckets=${bucketStats.getLong(0)} " +
          s"max_occ=${bucketStats.getLong(2)} pairs_ub=${bucketStats.getDouble(3)}")
        val nCands = time(s"cands pass$pass") {
          graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text",
            numHashes = 64, bands = 64, minBandHits = 4).count()
        }
        println(s"[minhash]   candidates=$nCands")
        time(s"refine pass$pass") {
          graft.operators.Dedup.minhashNearDups(docs, "doc_id", "text",
              threshold = 0.35, numHashes = 64, bands = 64,
              refineOnShingles = true, minBandHits = 4)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
