package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline queries at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout.
  *
  * Results are consumed through a `noop` sink — a bare `count()` would let
  * Catalyst prune the very projections being measured (column pruning
  * erases every ST_* call from a `select st_x(...) ... count()` plan), so
  * each query is fully evaluated and discarded, mirroring the reference's
  * criterion harness which materializes full batches
  * (/root/reference/benches/util.rs:55-66).
  */
object Bench {
  // Representative per-family coverage; every other query shares these
  // operators' physical shape.
  private val headline = Seq(
    "q02_astext",        // decode + WKT serialize, full scan
    "q07_intersects",    // spatial predicate vs folded constant (the reference's bench query)
    "q11_buffer_bbox",   // heavy GEOS-equivalent geometry op
    "q14_extent",        // two-phase UDAF aggregate
    "q16_split",         // polygonize pipeline
    "q20_dedup_exact",   // hash-agg dedup
    "q23_jaccard_tokens",// explode + self-join + agg
    "q24_cosine_topk",   // broadcast crossjoin + window top-k
    "q28_minhash_lsh",   // minhash scatter + agg
    "q32_events_hourly", // windowed agg over event time
    "q33_ref_linestring_intersects", // the reference's own criterion bench query
    "q34_text_profile",  // one-pass text curation profile
    "q48_asof_join",     // union + one shuffle + window-carry as-of join
    "q49_range_join",    // binned interval equi-join + anchor dedup
    "q70_topo_predicates", // full predicate family per row (5 JTS relate ops)
    "q73_dedup_clusters",  // iterative large-star/small-star connected components
    "q74_tfidf_terms",     // explode + token-keyed join + per-doc top-k window
    // round-6-8 heavy-operator families (regression-tracked since r9)
    "q80_dbscan",          // grid join + degree count + connected components
    "q92_dbscan_minpts1",  // DBSCAN minPts=1 boundary (every point core)
    "q104_mercator_tiles_geohash", // web-mercator reprojection + tile/geohash codegen
    "q105_cluster_kmeans", // Lloyd iterations + map-only argmin assignment
    "q110_paragraph_dedup",// hash-keyed election + position-set reassembly
    "q118_bigram_lm",      // two token-keyed hash-aggs + scoring join
    "q119_semantic_dedup", // cluster-keyed m² self-join + anti-join
    "q120_kmeans_assign_bcast", // broadcast-centroid argmax, k=2n
    "q122_kmeans_two_level")    // coarse/fine sharded assignment, full probe

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the event-time queries' TS_US goes through an NTZ->LTZ cast that
      // is exact only in a fixed-offset zone — pin UTC like Verify does
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The trailing ORDER BY in contract queries exists only to make the
    // driver's hash compare deterministic; the reference's criterion bench
    // has no ordering. Strip a top-level global Sort so the measurement is
    // the operator pipeline, not the compare harness.
    def stripSort(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.catalyst.plans.logical.Sort
      df.queryExecution.analyzed match {
        case Sort(_, true, child, _) => org.apache.spark.sql.graft.Shims.ofRows(spark, child)
        case _ => df
      }
    }

    // Criterion-like sampling (warm-up, then min AND median of N): min is
    // the steady-state capability number (robust to load spikes on the
    // shared box — a single-shot artifact once recorded a phantom 2x
    // regression); median quantifies the noise band so a round-over-round
    // drift can be told apart from environment jitter (r9's +8% subset
    // drift was uniform across every query — min alone couldn't prove it
    // was noise).
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

    // (min, median) per query; (-1, -1) on failure
    def run(name: String): (Double, Double) = {
      try {
        val df = stripSort(SparkEntry.queries(name)(spark, sfDir))
        // one warm-up run (plan + codegen compile + JIT), then N measured
        // runs
        df.write.format("noop").mode("overwrite").save()
        val times = (1 to iterations).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        (times.min, median(times))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        (-1.0, -1.0)
      }
    }

    // local-iteration subset (comma-separated prefixes); the driver
    // leaves it unset and always measures the full headline list
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .map(ps => headline.filter(n => ps.exists(n.startsWith)))
      .getOrElse(headline)
    val results = selected.map(n => n -> run(n))
    val qs = results.map { case (k, (mn, _)) => "\"" + k + "\":" + mn }.mkString("{", ",", "}")
    val qsMed = results.map { case (k, (_, md)) => "\"" + k + "\":" + md }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val totalMed = results.map(_._2._2).filter(_ >= 0).sum
    // headline set grows across rounds; this subtotal covers the queries
    // benchmarked since round 5 so round-over-round totals stay comparable
    val r5Set = Set("q02_astext", "q07_intersects", "q11_buffer_bbox", "q14_extent",
      "q16_split", "q20_dedup_exact", "q23_jaccard_tokens", "q24_cosine_topk",
      "q28_minhash_lsh", "q32_events_hourly", "q33_ref_linestring_intersects",
      "q34_text_profile", "q48_asof_join", "q49_range_join")
    val subtotal = results.collect { case (k, (mn, _)) if r5Set(k) && mn >= 0 => mn }.sum
    val subtotalMed = results.collect { case (k, (_, md)) if r5Set(k) && md >= 0 => md }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_median":$totalMed,"total_r5_subset":$subtotal,"total_r5_subset_median":$subtotalMed,"queries":$qs,"queries_median":$qsMed,"sf":"$sfDir","iterations":$iterations,"timing":"min and median of $iterations runs after 1 warm-up"}""")
    spark.stop()
  }
}
