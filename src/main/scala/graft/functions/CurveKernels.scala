package graft.functions

/** Space-filling-curve kernels (static, codegen-callable). */
object CurveKernels {

  /** Hilbert-curve index of cell (x, y) on the 2^bits x 2^bits grid —
    * the classic iterative xy2d walk (one reflect/rotate per bit level,
    * high bit first; see Hamilton's compact-Hilbert notes or the
    * Wikipedia pseudocode — public-domain algorithm). Inputs are
    * masked to `bits` low bits. Pure integer arithmetic: exact,
    * platform-free, and replayable level-by-level by the DuckDB
    * oracle's unrolled CTE chain.
    *
    * Versus Morton/z-order ([[graft.operators.ZOrder]]): consecutive
    * Hilbert indexes are ALWAYS 4-adjacent cells (unit Manhattan
    * steps, spec-verified exhaustively), so a contiguous index range
    * maps to a tighter spatial blob — no Morton "seam jumps" — at the
    * cost of not being a simple bit interleave. */
  def hilbertD(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // reflect within the full grid, then transpose (quadrant rotate)
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
