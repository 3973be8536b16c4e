package graft.operators

import graft.functions.GeoFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Scale design:
  *  - Brute force broadcasts the (small) query set against the corpus —
  *    a map-only scan, no shuffle until the final per-query top-k, which
  *    moves only k rows per query per partition (rank pushdown via the
  *    window's partial top-k is handled by AQE/TakeOrdered at small k).
  *  - The LSH variant buckets both sides by random-hyperplane sign bits
  *    and compares only within (multi-probed) buckets: the corpus scan
  *    becomes a bucket-equi-join, i.e. a shuffle keyed by bucket instead
  *    of a full cross product — the n·q term drops to Σ bucket-collisions.
  *  - IVF-style variant: k-means-free coarse quantization using the LSH
  *    bucket as the inverted-list key; `nProbe` flips of the lowest-margin
  *    bits emulate multi-probe search.
  */
object Ann {

  /** Exact top-k by cosine for each query vector (brute force baseline).
    * Output: (qid, nid, rnk). `queries` must be small enough to broadcast. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qid: String = "vec_id", qvec: String = "embedding",
      cid: String = "vec_id", cvec: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(qid).as("qid"), col(qvec).as("qv")))
    val c = corpus.select(col(cid).as("nid"), col(cvec).as("cv"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), vec_cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "nid", "rnk")
  }

  /** LSH-bucketed approximate top-k: candidates share the query's
    * hyperplane signature on at least one probe (the exact bucket plus
    * `nProbe` single-bit flips), then exact cosine ranks within the
    * candidate set. Recall grows with nProbe; cost stays ~bucket-sized. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 12, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    val sig = (v: String) => vec_lsh_sig(col(v), lit(nPlanes), lit(seed))
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("cv"),
      sig("embedding").as("bucket"))
    // each query probes its own bucket + nProbe 1-bit-flip neighbors
    val probes = array((0 until (nProbe + 1)).map { p =>
      if (p == 0) sig("embedding")
      else sig("embedding").bitwiseXOR(lit(1L << (p - 1)))
    }: _*)
    val q = broadcast(queries
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), explode(probes).as("bucket")))
    val scored = q.join(c, Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), vec_cosine(col("qv"), col("cv")).as("cos"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "nid", "rnk")
  }

  /** Train IVF coarse centroids: Lloyd iterations (cosine assignment,
    * mean update) on a bounded sample pulled to the driver — the standard
    * IVF recipe; at 100 TB the sample fraction shrinks, the k and iteration
    * count don't. Deterministic: seeded sample, seeded init. */
  def trainCentroids(corpus: DataFrame, nlist: Int, iters: Int = 5,
      maxSample: Int = 20000, seed: Long = 42L,
      vecCol: String = "embedding"): Array[Array[Float]] = {
    val n = corpus.count()
    val fraction = math.min(1.0, maxSample.toDouble / math.max(1L, n))
    val sample = corpus.select(col(vecCol)).sample(withReplacement = false, fraction, seed)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    var cents = Array.tabulate(nlist)(i => sample(i * (sample.length / nlist)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(nlist)(new Array[Double](cents(0).length))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val c = nearestIdx(v, cents)
        counts(c) += 1
        var d = 0
        while (d < v.length) { sums(c)(d) += v(d); d += 1 }
      }
      cents = Array.tabulate(nlist) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(s => (s / counts(c)).toFloat)
      }
    }
    cents
  }

  private def nearestIdx(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0; var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var d = 0
      while (d < v.length) {
        val x = v(d).toDouble; val y = cents(c)(d).toDouble
        dot += x * y; na += x * x; nb += y * y
        d += 1
      }
      val s = dot / (math.sqrt(na) * math.sqrt(nb))
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  /** IVF top-k: corpus rows are assigned to their nearest centroid's
    * inverted list (a codegen'd expression over the folded centroid
    * literal — a map-only pass); each query scans only its `nProbe`
    * closest lists. The corpus-side assignment is computed once and can be
    * persisted/bucketed by `list` for repeated query batches. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nProbe: Int = 4, iters: Int = 5, seed: Long = 42L): DataFrame = {
    val cents = trainCentroids(corpus, nlist, iters, seed = seed)
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("cv"),
      vec_nearest_centroid(col("embedding"), centLit).as("list"))
    // per-query probe lists: nProbe best centroids, computed driver-side? —
    // no: same expression, exploded over a literal range, stays distributed
    val q = broadcast(queries
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("scored", array((0 until nlist).map { i =>
        struct(vec_cosine(col("qv"), typedLit(cents(i).toSeq)).as("s"), lit(i).as("list"))
      }: _*))
      .withColumn("probe", slice(reverse(array_sort(col("scored"))), 1, nProbe))
      .withColumn("p", explode(col("probe")))
      .select(col("qid"), col("qv"), col("p.list").as("list")))
    val scored = q.join(c, Seq("list"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), vec_cosine(col("qv"), col("cv")).as("cos"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "nid", "rnk")
  }

  /** Recall of an approximate result against the exact one: fraction of
    * (qid, nid) pairs recovered. Both inputs shaped (qid, nid, rnk). */
  def recall(approx: DataFrame, exact: DataFrame): Double = {
    val hit = approx.join(exact, Seq("qid", "nid")).count().toDouble
    val total = exact.count().toDouble
    if (total == 0) 1.0 else hit / total
  }
}
