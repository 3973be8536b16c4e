package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch component-timing probe for the r21 optimization round: time
  * named sub-plans of hot queries with the noop sink (min of N passes,
  * warm), so a query's cost attributes to its stages. Dev-only; variants
  * are edited in place. Run:
  * `sbt "Test/runMain graft.tools.Probe q149"`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "q149"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GeoFunctions.register(spark)
    Seq("lineitem", "documents", "embeddings", "events").foreach { t =>
      val p = s"$sfDir/$t.parquet"
      if (new java.io.File(p).exists()) {
        var df = spark.read.parquet(p)
        if (new java.io.File(p).length() > (256 << 10) &&
            df.rdd.getNumPartitions < cpus.toInt)
          df = df.repartition(cpus.toInt, col(df.columns.head))
        df.createOrReplaceTempView(t)
      }
    }
    def time(name: String, df: DataFrame, passes: Int = 3): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-40s min=${ts.min}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    which match {
      case "q149" =>
        val cells = spark.sql("""
          SELECT l_linenumber AS grp,
                 ST_MakeEnvelope(CAST(l_orderkey % 100 AS DOUBLE),
                                 CAST((l_orderkey DIV 100) % 50 AS DOUBLE),
                                 CAST(l_orderkey % 100 AS DOUBLE) + 1,
                                 CAST((l_orderkey DIV 100) % 50 AS DOUBLE) + 1) AS g
          FROM lineitem""")
        time("cells scan+makeenvelope", cells)
        time("cells + isnotnull filter", cells.where(col("g").isNotNull))
        val boxed = cells.where(col("g").isNotNull)
          .withColumn("__b", graft.functions.GeoFunctions.box2d(col("g")))
          .withColumn("__cx", floor((col("__b.xmin") + col("__b.xmax")) / 2 / 8.0).cast("long"))
          .withColumn("__cy", floor((col("__b.ymin") + col("__b.ymax")) / 2 / 8.0).cast("long"))
        time("cells+filter+box+cxcy", boxed)
        val dedup = boxed.groupBy(col("grp"), col("__cx"), col("__cy"), col("g"))
          .agg(count(lit(1)).as("__n"))
        time("+ dedup agg", dedup)
        val lvl1 = dedup.groupBy("grp", "__cx", "__cy")
          .agg(graft.functions.GeoFunctions.st_union_agg(col("g")).as("g"),
            sum("__n").as("__n"))
        time("+ level1 union", lvl1)
        time("full q149", graft.SparkEntry.queries("q149_union_agg")(spark, sfDir))
      case "q202" =>
        val docs = spark.table("documents").where(col("doc_id") < 2000)
        val grid = docs.select(col("doc_id").as("__id"),
            explode(split(coalesce(col("text").cast("string"), lit("")), " ")).as("__tok"))
          .where(col("__tok") =!= "").distinct()
        time("grid (explode+distinct)", grid)
        val sizes = grid.groupBy("__id").agg(count(lit(1)).as("__n"))
        val dfreq = grid.groupBy("__tok").agg(count(lit(1)).as("__df"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("__id")
          .orderBy(col("__df").asc, col("__tok").asc)
        val prefix = grid.join(dfreq, Seq("__tok")).join(sizes, Seq("__id"))
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= col("__n") - ceil(lit(0.9) * col("__n") - lit(1e-9)) + 1)
          .select("__tok", "__id", "__rn", "__n")
        time("prefix", prefix)
        val a = prefix.select(col("__tok"), col("__id").as("ida"),
          col("__rn").as("__ra"), col("__n").as("size_a"))
        val b = prefix.select(col("__tok"), col("__id").as("idb"),
          col("__rn").as("__rb"), col("__n").as("size_b"))
        val cand = a.join(b, Seq("__tok")).where(col("ida") < col("idb"))
          .where(least(col("size_a"), col("size_b")).cast("double") >=
            lit(0.9) * greatest(col("size_a"), col("size_b")).cast("double") - lit(1e-9))
          .withColumn("__ub", lit(1L) + least(col("size_a") - col("__ra"),
            col("size_b") - col("__rb")))
          .groupBy("ida", "idb", "size_a", "size_b").agg(max("__ub").as("__maxub"))
          .where(col("__maxub").cast("double") >=
            ceil(lit(0.9 / 1.9) * (col("size_a") + col("size_b")) - lit(1e-9)))
          .select("ida", "idb", "size_a", "size_b")
        time("candidates", cand)
        val v1 = cand.join(grid.select(col("__id").as("ida"), col("__tok")), Seq("ida"))
        time("verify join a", v1)
        val v2 = v1.join(grid.select(col("__id").as("idb"), col("__tok")), Seq("idb", "__tok"))
        time("verify join b", v2)
        val v3 = v2.groupBy("ida", "idb", "size_a", "size_b")
          .agg(count(lit(1)).as("inter"))
          .where(col("inter").cast("double") >=
            lit(0.9) * (col("size_a") + col("size_b") - col("inter")) - lit(1e-9))
        time("verify agg", v3)
        time("full q202", graft.SparkEntry.queries("q202_jaccard_join")(spark, sfDir))
      case "q189" =>
        val li = spark.table("lineitem").where(col("l_orderkey") % 5 === 0)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        time("li distinct (o,p)", li)
        val edges = li.toDF("o", "p1").join(li.toDF("o", "p2"), Seq("o"))
          .where(col("p1") < col("p2"))
          .select(col("p1").as("src"), col("p2").as("dst"))
        time("edges (wedge self-join)", edges)
        val und = edges.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct()
        time("und (distinct)", und)
        val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        time("deg", deg)
        val ord = und
          .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), Seq("a"))
          .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), Seq("b"))
          .select(
            when(col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b")), col("a"))
              .otherwise(col("b")).as("u"),
            when(col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b")), col("b"))
              .otherwise(col("a")).as("w"))
        time("ord (orientation)", ord)
        val e1 = ord.select(col("u"), col("w").as("v"))
        val e2 = ord.select(col("u"), col("w"))
        val tri = e1.join(e2, Seq("u")).where(col("v") < col("w"))
          .join(und, col("v") === col("a") && col("w") === col("b"))
          .select("u", "v", "w")
        time("tri (wedges+close)", tri)
        time("full q189", graft.SparkEntry.queries("q189_triangle_stats")(spark, sfDir))
      case "q187" =>
        val li = spark.table("lineitem")
        val sk = graft.operators.Freq.cmsBuild(li, "l_partkey", width = 256, depth = 3)
        time("cms build", sk)
        val probe = li.where(col("l_partkey") % 37 === 0).select("l_partkey").distinct()
        time("probe distinct", probe)
        val est = graft.operators.Freq.cmsEstimate(sk, probe, "l_partkey", 256, 3)
        time("estimate", est)
        val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("exact"))
        time("exact counts", exact)
        time("est join exact", est.join(exact, Seq("l_partkey")))
        time("full q187", graft.SparkEntry.queries("q187_cms_counts")(spark, sfDir))
      case "q146" =>
        val queries = spark.createDataFrame(Seq(
          (0L, "hash join"), (1L, "slow scan filter"),
          (2L, "vector window spark"), (3L, "nosuchtoken"))).toDF("qid", "qtext")
        val docs = spark.table("documents")
        val postings = docs.select(col("doc_id").as("__id"),
            explode(split(coalesce(col("text").cast("string"), lit("")), " ")).as("__tok"))
          .where(col("__tok") =!= "")
          .groupBy("__id", "__tok").agg(count(lit(1)).as("__tf"))
        time("postings", postings)
        val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("__id")
        time("postings+dl window", postings.withColumn("__dl", sum("__tf").over(wDoc)))
        time("full q146", graft.SparkEntry.queries("q146_bm25")(spark, sfDir))
        time("full q184", graft.SparkEntry.queries("q184_rrf_fusion")(spark, sfDir))
        time("full q244", graft.SparkEntry.queries("q244_retrieval_e2e")(spark, sfDir))
      case other =>
        time(s"full $other", graft.SparkEntry.queries(
          graft.SparkEntry.queries.keys.find(_.startsWith(other)).get)(spark, sfDir))
    }
    spark.stop()
  }
}
