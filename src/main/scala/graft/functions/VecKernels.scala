package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector kernels over Catalyst ArrayData (float32 embeddings),
  * invoked from codegen'd expressions — no per-row array materialization
  * beyond what Catalyst already holds.
  *
  * Accumulation is double, strictly left-to-right, so results are
  * deterministic and bit-identical to a straightforward double loop (the
  * DuckDB oracle computes the same sequence).
  */
object VecKernels {

  /** Cosine similarity of two float vectors; NaN when either norm is 0. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"vector length mismatch: $n vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"vector length mismatch: $n vs ${b.numElements()}")
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  def normF(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Unit-L2 normalization: double accumulation/division, float32 out
    * (the embedding dtype). A zero vector passes through unchanged. */
  def normalizeF(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val nrm = normF(a)
    val out = new Array[Any](n)
    var i = 0
    if (nrm == 0.0) while (i < n) { out(i) = a.getFloat(i); i += 1 }
    else while (i < n) { out(i) = (a.getFloat(i).toDouble / nrm).toFloat; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Matryoshka truncation: the first `dim` components re-normalized to
    * unit L2 — the MRL contract that prefixes of nested-trained
    * embeddings are valid embeddings after renormalization. Norm is
    * accumulated over the KEPT prefix only, left-to-right in double. */
  def truncateF(a: ArrayData, dim: Int): ArrayData = {
    val n = a.numElements()
    require(dim >= 1 && dim <= n,
      s"vec_truncate: dim must be in 1..$n; got $dim")
    var s = 0.0
    var i = 0
    while (i < dim) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Any](dim)
    i = 0
    if (nrm == 0.0) while (i < dim) { out(i) = a.getFloat(i); i += 1 }
    else while (i < dim) { out(i) = (a.getFloat(i).toDouble / nrm).toFloat; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Index of the centroid (array of float vectors) with the highest
    * cosine similarity to `v` — the IVF coarse-quantization assignment. */
  /** Per-thread single-entry cache of a decoded centroid set, keyed by
    * OBJECT IDENTITY of the ArrayData. A folded literal hands the SAME
    * instance to every row, so the k·dim accessor decode and the k norm
    * computations run once per task. Identity (not buffer address) is
    * the soundness line: Spark reuses row buffers between rows, so an
    * UnsafeArrayData view over fresh bytes can reappear at the same
    * base+offset with different content — such views are NEW wrapper
    * objects each call and therefore always miss here, falling back to
    * a correct per-row decode. (The broadcast assignment path avoids
    * the miss cost entirely via [[nearestCentroidDirect]] over a
    * Broadcast handle.) */
  private final class CentCache {
    var key: AnyRef = null
    var cents: Array[Array[Float]] = null
    var sqrtNb: Array[Double] = null
  }
  private val centCache = new ThreadLocal[CentCache] {
    override def initialValue(): CentCache = new CentCache
  }

  /** Decode a centroid ArrayData to float[][] plus per-centroid
    * sqrt(Σy²) accumulated left-to-right exactly as [[cosineF]] does. */
  def decodeCentroids(centroids: ArrayData): (Array[Array[Float]], Array[Double]) = {
    val k = centroids.numElements()
    val cents = new Array[Array[Float]](k)
    val nbs = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ca = centroids.getArray(c)
      val m = ca.numElements()
      val arr = new Array[Float](m)
      var nb = 0.0
      var i = 0
      while (i < m) {
        val y = ca.getFloat(i)
        arr(i) = y; nb += y.toDouble * y.toDouble
        i += 1
      }
      cents(c) = arr; nbs(c) = math.sqrt(nb)
      c += 1
    }
    (cents, nbs)
  }

  def nearestCentroid(v: ArrayData, centroids: ArrayData): Int = {
    val cache = centCache.get()
    if (!(cache.key eq centroids)) {
      val (cents, nbs) = decodeCentroids(centroids)
      cache.key = centroids; cache.cents = cents; cache.sqrtNb = nbs
    }
    nearestCentroidDirect(v, cache.cents, cache.sqrtNb)
  }

  /** Exact argmax-by-cosine against a pre-decoded centroid set; every
    * score is bit-identical to cosineF(v, centroids(c)) — dot and na
    * accumulate left-to-right exactly as cosineF's interleaved loop. */
  def nearestCentroidDirect(v: ArrayData, cents: Array[Array[Float]],
      sqrtNb: Array[Double]): Int = {
    val n = v.numElements()
    val vv = new Array[Float](n)
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i)
      vv(i) = x; na += x.toDouble * x.toDouble
      i += 1
    }
    val sqrtNa = math.sqrt(na)
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      require(cent.length == n,
        s"vector length mismatch: $n vs ${cent.length}")
      var dot = 0.0
      var d = 0
      while (d < n) { dot += vv(d).toDouble * cent(d).toDouble; d += 1 }
      val s = dot / (sqrtNa * sqrtNb(c))
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  /** Top-`k` centroid indices by cosine against a pre-decoded codebook,
    * ordered best-first with score ties resolved toward the HIGHER
    * index — exactly the order the literal probe scorer produces
    * (`reverse(array_sort(struct(cos, list)))` sorts descending by
    * (cos, list)), so swapping scorers can never change which cells an
    * IVF search probes. Scores accumulate bit-identically to
    * [[cosineF]]; insertion is O(nlist·k) worst case with k = nProbe
    * (small by contract). */
  def topCentroidsDirect(v: ArrayData, cents: Array[Array[Float]],
      sqrtNb: Array[Double], k: Int): Array[Int] = {
    val n = v.numElements()
    val vv = new Array[Float](n)
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i)
      vv(i) = x; na += x.toDouble * x.toDouble
      i += 1
    }
    val sqrtNa = math.sqrt(na)
    val kk = math.min(k, cents.length)
    if (kk <= 0) return Array.emptyIntArray
    val topS = new Array[Double](kk)
    val topI = new Array[Int](kk)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      require(cent.length == n,
        s"vector length mismatch: $n vs ${cent.length}")
      var dot = 0.0
      var d = 0
      while (d < n) { dot += vv(d).toDouble * cent(d).toDouble; d += 1 }
      val s = dot / (sqrtNa * sqrtNb(c))
      // java.lang.Double.compare, not <, so a NaN score (zero-norm query
      // or centroid) sorts GREATEST and equal-to-itself — exactly how
      // Spark's array_sort orders doubles, keeping the two scorers in
      // lockstep on degenerate vectors too
      if (filled < kk || java.lang.Double.compare(s, topS(filled - 1)) >= 0) {
        // c is the highest index seen so far, so on a tied score the
        // candidate outranks every held entry — insert BEFORE the first
        // slot whose score is <= s (strictly-better entries stay above)
        var p = 0
        while (p < filled && java.lang.Double.compare(topS(p), s) > 0) p += 1
        if (p < kk) {
          val end = math.min(filled, kk - 1)
          var m = end
          while (m > p) { topS(m) = topS(m - 1); topI(m) = topI(m - 1); m -= 1 }
          topS(p) = s; topI(p) = c
          if (filled < kk) filled += 1
        }
      }
      c += 1
    }
    java.util.Arrays.copyOf(topI, filled)
  }

  /** Sign bits of the vector against `nPlanes` deterministic pseudo-random
    * hyperplanes (SplitMix64-generated components) — the LSH bucket key
    * for approximate nearest-neighbor search. nPlanes <= 63. */
  def hyperplaneSig(a: ArrayData, nPlanes: Int, seed: Long): Long = {
    val n = a.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      if (planeDot(a, p, seed) >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  private def planeDot(a: ArrayData, plane: Int, seed: Long): Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      // component ~ uniform in [-1, 1) derived from (seed, plane, dim)
      val h = TextKernels.splitmix64(seed + plane.toLong * 1000003L + i)
      val comp = (h >> 11).toDouble / (1L << 52).toDouble // [-1, 1)
      dot += a.getFloat(i).toDouble * comp
      i += 1
    }
    dot
  }

  /** Margin-aware multi-probe bucket sequence (Lv et al., "Multi-Probe
    * LSH", VLDB'07): the query's exact bucket followed by buckets obtained
    * by flipping SUBSETS of the planes with the smallest |margin| — the
    * planes a true near neighbor is most likely to land on the other side
    * of. Probes are ordered by total flipped margin, so the first `nProbe`
    * are the highest-probability buckets. Returns `min(nProbe + 1, 2^m)`
    * bucket keys (m = min(nPlanes, 12) candidate flip planes).
    *
    * Only the (small) query side pays this cost; the corpus side computes
    * just its own [[hyperplaneSig]] bucket. */
  def hyperplaneProbes(a: ArrayData, nPlanes: Int, seed: Long, nProbe: Int): Array[Long] = {
    val dots = new Array[Double](nPlanes)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val d = planeDot(a, p, seed)
      dots(p) = d
      if (d >= 0) sig |= (1L << p)
      p += 1
    }
    val m = math.min(nPlanes, 12) // subset enumeration stays bounded (4096)
    val order = Array.range(0, nPlanes).sortBy(i => math.abs(dots(i))).take(m)
    val nSubsets = 1 << m
    // score of a subset = sum of flipped |margins|; enumerate and keep the
    // cheapest nProbe+1 (subset 0 = the exact bucket, score 0)
    val scored = new Array[(Double, Long)](nSubsets)
    var s = 0
    while (s < nSubsets) {
      var score = 0.0
      var mask = 0L
      var b = 0
      while (b < m) {
        if (((s >> b) & 1) == 1) { score += math.abs(dots(order(b))); mask |= (1L << order(b)) }
        b += 1
      }
      scored(s) = (score, sig ^ mask)
      s += 1
    }
    scored.sortBy(_._1).take(math.min(nProbe + 1, nSubsets)).map(_._2)
  }

  // ---- product quantization (IVF-PQ) -------------------------------------
  // Flat codebook layout throughout: cb[(j*ksub + c)*dsub + d] is
  // component d of sub-centroid c of subspace j (j in 0..m-1, c in
  // 0..ksub-1, dsub = dim/m). ksub <= 256 so one code fits a byte.

  /** Encode a float vector as m one-byte codes: subspace j's code is the
    * index of the L2-nearest of its ksub sub-centroids (ties to the
    * LOWEST index — deterministic). L2 in the subspace, not cosine:
    * subvector magnitudes carry into the reconstructed dot product, so
    * dropping them would corrupt the ADC score. */
  def pqEncode(v: ArrayData, cb: Array[Float], m: Int, ksub: Int): Array[Byte] = {
    val dim = v.numElements()
    val arr = new Array[Float](dim)
    var d = 0
    while (d < dim) { arr(d) = v.getFloat(d); d += 1 }
    pqEncodeArr(arr, cb, m, ksub)
  }

  /** [[pqEncode]] of the RESIDUAL v − cent (both in the same space —
    * unit-normalized vectors and unit-normalized coarse centroids):
    * the by-residual IVF-PQ encoding, which spends the codebook's bits
    * on the within-list offsets instead of re-describing the centroid
    * every list shares. */
  def pqEncodeResidual(v: ArrayData, cent: Array[Float], cb: Array[Float],
      m: Int, ksub: Int): Array[Byte] = {
    val dim = v.numElements()
    require(cent.length == dim,
      s"centroid dim ${cent.length} != vector dim $dim")
    val r = new Array[Float](dim)
    var d = 0
    while (d < dim) { r(d) = v.getFloat(d) - cent(d); d += 1 }
    pqEncodeArr(r, cb, m, ksub)
  }

  /** [[pqEncode]] over a plain array (driver-side and residual path). */
  def pqEncodeArr(v: Array[Float], cb: Array[Float], m: Int,
      ksub: Int): Array[Byte] = {
    val dim = v.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subquantizers")
    val dsub = dim / m
    require(cb.length == m * ksub * dsub,
      s"codebook length ${cb.length} != m*ksub*dsub = ${m * ksub * dsub}")
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val diff = v(j * dsub + d).toDouble - cb(base + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    codes
  }

  /** ADC lookup table for one query vector: lut[j*ksub + c] =
    * dot(q_sub_j, cb[j][c]), double-accumulated, float32 out. Computed
    * ONCE per query (m*ksub*dsub mults); afterwards every candidate
    * scores in m table lookups instead of dim mults. */
  def pqLut(q: Array[Float], cb: Array[Float], m: Int, ksub: Int): Array[Float] = {
    require(q.length % m == 0, s"dim ${q.length} not divisible by m=$m")
    val dsub = q.length / m
    require(cb.length == m * ksub * dsub,
      s"codebook length ${cb.length} != m*ksub*dsub = ${m * ksub * dsub}")
    val lut = new Array[Float](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var dot = 0.0
        var d = 0
        while (d < dsub) { dot += q(j * dsub + d).toDouble * cb(base + d); d += 1 }
        lut(j * ksub + c) = dot.toFloat
        c += 1
      }
      j += 1
    }
    lut
  }

  /** ADC score: sum_j lut[j*ksub + codes[j]] — the approximate inner
    * product of the query with the PQ reconstruction of the candidate.
    * Invoked from codegen per (query, candidate) pair; m adds. */
  def pqAdc(lut: ArrayData, codes: Array[Byte], ksub: Int): Double = {
    val m = codes.length
    require(lut.numElements() == m * ksub,
      s"LUT length ${lut.numElements()} != m*ksub = ${m * ksub}")
    var s = 0.0
    var j = 0
    while (j < m) { s += lut.getFloat(j * ksub + (codes(j) & 0xFF)); j += 1 }
    s
  }

  /** PQ reconstruction of a code sequence (concatenated sub-centroids) —
    * the decode side of [[pqEncode]], for audits and L2/dot consumers. */
  def pqReconstruct(codes: Array[Byte], cb: Array[Float], ksub: Int): Array[Float] = {
    val m = codes.length
    require(cb.length % (m * ksub) == 0,
      s"codebook length ${cb.length} not divisible by m*ksub = ${m * ksub}")
    val dsub = cb.length / (m * ksub)
    val out = new Array[Float](m * dsub)
    var j = 0
    while (j < m) {
      val base = (j * ksub + (codes(j) & 0xFF)) * dsub
      System.arraycopy(cb, base, out, j * dsub, dsub)
      j += 1
    }
    out
  }
}
