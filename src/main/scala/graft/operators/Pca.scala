package graft.operators

import graft.util.Round6.{rz6, rz6d}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the
  * dimensionality/whitening step of an embedding curation pipeline
  * (decorrelate before [[Ann]]'s coarse quantizer, project to the
  * variance-carrying subspace before SemDeDup-style thresholding, audit
  * a corpus's effective dimensionality).
  *
  * Algorithm: one distributed pass accumulates the d and d×d raw
  * moments (Σx, Σxxᵀ); the driver forms the covariance C = E[xxᵀ] −
  * E[x]E[x]ᵀ (d² doubles — the k·dim "centroid" scale, never corpus
  * scale) and extracts the top `components` eigenpairs by power
  * iteration with deflation — a FIXED iteration count, so the whole
  * fit is a deterministic function of the moments, replayable by any
  * engine (q147's oracle reruns all iterations as unrolled SQL CTEs,
  * the `trainQualityLr` GD-replay precedent). Projection is then a
  * map-only codegen'd expression over broadcast-literal vectors.
  *
  * Determinism contract: every product, quotient, and matrix-vector
  * component is rounded by the [[graft.util.Round6]] law before it
  * feeds the next step, and every sum adds only 6dp terms — so the
  * moments are partition-order-independent (terms are exact 1e-6
  * multiples; double noise ≪ the 5e-7 snap margin) and the iteration
  * is bit-reproducible across engines. `sqrt` is IEEE
  * correctly-rounded, so the norm needs no special law beyond rounding
  * its 6dp-termed radicand and its result. The eigenvector SIGN is
  * pinned by the deterministic start vector v₀ = rz6(1/√d)·𝟙 (C is
  * PSD, so iteration preserves the sign of ⟨v₀, e⟩; no post-hoc sign
  * fix that an oracle would have to replicate).
  *
  * Scale design (100 TB): the corpus is scanned ONCE; each partition
  * emits a single (n, Σx, Σxxᵀ) row (d=1024 → 4 MB of partials per
  * partition, map-side only), collected to the driver exactly like the
  * Lloyd-step centroid partials — no shuffle at all, nothing
  * corpus-sized anywhere. The per-row cost is d²/2 multiplies (upper
  * triangle, mirrored). Fit state on the driver is d² + O(k·d)
  * doubles. Projection broadcasts mean + components as folded literals
  * inside whole-stage codegen — a map-only scan, no UDF, no shuffle.
  *
  * Summation-law validity bound: partial sums stay exact while
  * n_terms·ulp(Σ) ≪ 5e-7; with |x| ≲ 10 that holds beyond 10⁹ rows per
  * partition — above that, split partitions (`maxRecordsPerFile` /
  * `maxPartitionBytes` already bound this at the target layout). */
object Pca {

  /** Fitted model: `mean(i)`, `components(c)(i)` (unit vectors, rows =
    * principal axes, descending eigenvalue), `lambdas(c)` (the variance
    * captured by axis c), and `n` (rows fitted). */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      lambdas: Array[Double], n: Long)

  /** One-pass raw moments of the embedding column over 6dp-rounded
    * terms: (n, Σ rz6(xᵢ), Σ rz6(xᵢxⱼ) row-major d×d). NULL vectors are
    * skipped; ragged dimensions throw (a silently truncated moment
    * matrix would fit a wrong model). */
  def moments(df: DataFrame, vecCol: String): (Long, Array[Double], Array[Double]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df.select(col(vecCol)).where(col(vecCol).isNotNull)
      .as[Seq[Float]]
      .mapPartitions { rows =>
        var n = 0L
        var s1: Array[Double] = null
        var s2: Array[Double] = null
        var d = -1
        rows.foreach { v =>
          if (d < 0) { d = v.length; s1 = new Array(d); s2 = new Array(d * d) }
          require(v.length == d,
            s"ragged embedding dimension: saw $d then ${v.length}")
          val x = new Array[Double](d)
          var i = 0
          while (i < d) { x(i) = v(i).toDouble; i += 1 }
          i = 0
          while (i < d) {
            s1(i) += rz6d(x(i))
            var j = i
            while (j < d) {
              val t = rz6d(x(i) * x(j))
              s2(i * d + j) += t
              if (j != i) s2(j * d + i) += t
              j += 1
            }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single((n, s1.toSeq, s2.toSeq))
      }.collect()
    require(partials.nonEmpty, "moments of an empty/all-null embedding column")
    val d = partials.head._2.length
    val s1 = new Array[Double](d)
    val s2 = new Array[Double](d * d)
    var n = 0L
    partials.foreach { case (pn, p1, p2) =>
      require(p1.length == d, s"ragged embedding dimension across partitions: $d vs ${p1.length}")
      n += pn
      var i = 0
      while (i < d) { s1(i) += p1(i); i += 1 }
      i = 0
      while (i < d * d) { s2(i) += p2(i); i += 1 }
    }
    (n, s1, s2)
  }

  /** Covariance from [[moments]] under the rounding law:
    * C_ij = rz6(rz6(rz6(S2_ij)/n) − rz6(mean_i·mean_j)) with
    * mean_i = rz6(rz6(S1_i)/n).
    *
    * The sums are SNAPPED (rz6) before dividing — `trainQualityLr`'s
    * gradient rule, and load-bearing: a raw Σ-of-6dp-terms divided by n
    * lands EXACTLY on a 6dp half-boundary whenever Σ·10⁶ ≡ n/2 (mod n)
    * — 1 in 500 cells at n=500 — and there the engines' different
    * summation orders decide the snap direction. Snapping first makes
    * the dividend the bit-exact true multiple on every engine, so the
    * quotient (and its snap) is reproducible even on the boundary. */
  def covariance(n: Long, s1: Array[Double], s2: Array[Double]): (Array[Double], Array[Double]) = {
    val d = s1.length
    val mean = s1.map(s => rz6d(rz6d(s) / n))
    val cov = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        cov(i * d + j) = rz6d(rz6d(rz6d(s2(i * d + j)) / n) - rz6d(mean(i) * mean(j)))
        j += 1
      }
      i += 1
    }
    (mean, cov)
  }

  /** Power iteration with deflation on the driver-held covariance —
    * FIXED `iters` steps per component (convergence is not tested; a
    * data-dependent stop would make the replay depend on float
    * comparisons the oracle can't see). Returns (components, lambdas)
    * with λ_c = ‖C_c v‖ of the final step — for a PSD matrix the
    * Rayleigh limit. */
  def powerIteration(cov: Array[Double], d: Int, components: Int,
      iters: Int): (Array[Array[Double]], Array[Double]) = {
    require(components >= 1 && components <= d, s"components must be in 1..$d")
    require(iters >= 1, "iters must be positive")
    val c = cov.clone()
    val comps = Array.ofDim[Array[Double]](components)
    val lambdas = new Array[Double](components)
    var k = 0
    while (k < components) {
      var v = Array.fill(d)(rz6d(1.0 / math.sqrt(d.toDouble)))
      var lambda = 0.0
      var t = 0
      while (t < iters) {
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var acc = 0.0
          var j = 0
          while (j < d) { acc += rz6d(c(i * d + j) * v(j)); j += 1 }
          w(i) = rz6d(acc)
          i += 1
        }
        var sq = 0.0
        var i2 = 0
        while (i2 < d) { sq += rz6d(w(i2) * w(i2)); i2 += 1 }
        // snap the radicand before sqrt — same rule as [[covariance]]'s
        // dividends (sqrt of the bit-exact multiple is engine-identical)
        lambda = rz6d(math.sqrt(rz6d(sq)))
        require(lambda > 0.0,
          "power iteration collapsed to the zero vector (rank-deficient " +
            s"covariance at component $k); request fewer components")
        i2 = 0
        while (i2 < d) { v(i2) = rz6d(w(i2) / lambda); i2 += 1 }
        t += 1
      }
      comps(k) = v
      lambdas(k) = lambda
      // deflate: C ← rz6(C − rz6(λ·v_i)·v_j)
      var i = 0
      while (i < d) {
        val lvi = rz6d(lambda * v(i))
        var j = 0
        while (j < d) {
          c(i * d + j) = rz6d(c(i * d + j) - rz6d(lvi * v(j)))
          j += 1
        }
        i += 1
      }
      k += 1
    }
    (comps, lambdas)
  }

  /** Fit mean + top-`components` principal axes in one corpus pass. */
  def fit(df: DataFrame, vecCol: String, components: Int = 2,
      iters: Int = 12): PcaModel = {
    val (n, s1, s2) = moments(df, vecCol)
    val (mean, cov) = covariance(n, s1, s2)
    val (comps, lambdas) = powerIteration(cov, mean.length, components, iters)
    PcaModel(mean, comps, lambdas, n)
  }

  /** The ±1 sign matrix of [[randomProject]], derived from the engine's
    * shared 48-bit-md5 hash law so ANY engine can rebuild it without
    * shipping an artifact: `sign(c, j) = +1 iff
    * (first 12 hex chars of md5("rp:<seed>:<c>:<j>") as int) % 2 == 0`.
    * Exposed for oracles/tests. */
  def rpSign(seed: Long, c: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp:$seed:$c:$j".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions
    * with a dense Rademacher (±1/√p) matrix (Achlioptas 2003, database-
    * friendly projections: ±1 entries preserve pairwise distances with
    * the same JL guarantee as Gaussians) — the cheap, model-free
    * companion to [[fit]]/[[project]]: no training pass at all, so it is
    * the right reduction when the corpus is scanned exactly once, and
    * the matrix is a pure hash function ([[rpSign]]) — nothing to
    * persist, broadcast, or version.
    *
    * `rp_c = rz6(rz6(Σ_j rz6(x_j·s_cj)) · rz6(1/√p))` — terms rounded
    * before the sum, the sum SNAPPED before scaling (the [[covariance]]
    * boundary rule), all under the [[graft.util.Round6]] law.
    *
    * Scale design (100 TB): strictly map-only — the p×d signs fold into
    * the plan as literals inside whole-stage codegen (p·d ≤ ~64k
    * doubles for p=64, d=1024; far under the 64 KB codegen method limit
    * because each output column is one zip_with/aggregate pair), no
    * UDF, no shuffle, no driver state beyond the literal matrix. NULL
    * vectors map to NULL outputs. */
  def randomProject(df: DataFrame, vecCol: String, inDim: Int, outDim: Int,
      seed: Long = 42L): DataFrame = {
    require(outDim >= 1 && inDim >= 1, "dimensions must be positive")
    val scale = rz6d(1.0 / math.sqrt(outDim.toDouble))
    (0 until outDim).foldLeft(df) { case (acc, c) =>
      val signs = array((0 until inDim).map(j => lit(rpSign(seed, c, j))): _*)
      val terms = zip_with(col(vecCol), signs, (x, s) => rz6(x.cast("double") * s))
      acc.withColumn(s"rp${c + 1}",
        rz6(rz6(aggregate(terms, lit(0.0), (s: Column, t: Column) => s + t)) * lit(scale)))
    }
  }

  /** Map-only projection onto the fitted axes: one `pc<k>` column per
    * component, `pc_c = rz6(Σ_j rz6((x_j − mean_j)·v_cj))` — centered
    * against the model's mean, built from codegen'd higher-order
    * functions over broadcast-literal arrays (no UDF, no shuffle; NULL
    * vectors project to NULL). */
  def project(df: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val meanArr = array(model.mean.toIndexedSeq.map(lit): _*)
    val centered = zip_with(col(vecCol), meanArr, (x, m) => x.cast("double") - m)
    model.components.toIndexedSeq.zipWithIndex
      .foldLeft(df) { case (acc, (v, c)) =>
        val vArr = array(v.toIndexedSeq.map(lit): _*)
        val terms = zip_with(centered, vArr, (x, w) => rz6(x * w))
        acc.withColumn(s"pc${c + 1}",
          rz6(aggregate(terms, lit(0.0), (s: Column, t: Column) => s + t)))
      }
  }
}
