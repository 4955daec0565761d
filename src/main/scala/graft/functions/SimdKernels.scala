package graft.functions

import jdk.incubator.vector.{ByteVector, DoubleVector, IntVector, VectorOperators, VectorSpecies}

/** Vector-API (JEP 438, public JDK incubator) kernels for the
  * memory/compute-bound WARM-SERVE paths — the round-11 ServeLoadProbe
  * finding: OPQ serving flattens at ~2k QPS on the d² query rotation
  * and SQ8 at ~1.4k QPS on the full-dim byte scans, both far below the
  * PQ path's 6.7k. These kernels vectorize ACROSS OUTPUT ROWS with the
  * per-row reduction kept STRICTLY SEQUENTIAL, so every lane computes
  * the exact FP operation sequence of the scalar loop and results are
  * BIT-IDENTICAL (asserted by SimdKernelsSpec over random inputs, and
  * transitively by the bit-parity serve gates):
  *
  *  - [[rotateExact]]: out(r) = Σ_t R(r,t)·v(t). Lane r accumulates
  *    `acc = (row·v) + acc` in ascending t — the scalar `s += row(t)*v(t)`
  *    exactly (separate MUL then ADD; no FMA, which would round once
  *    instead of twice and diverge). Rows are independent, so 8 rows
  *    ride one 512-bit accumulator; the matrix is TRANSPOSED once at
  *    pin time ([[transposed]]) so the 8 lane loads at each t are one
  *    contiguous read instead of a stride-d gather.
  *  - [[sq8DistExact]]: out(r) = Σ_i (loc(i) − (min(i) + code(r,i)·Δ(i)))².
  *    Same row-lane construction over a COLUMN-MAJOR byte layout
  *    (codesT(i·n + r), packed at pin time); bytes widen
  *    ZERO_EXTEND_B2I → I2D, the vector form of the scalar `& 0xFF`.
  *    IEEE addition is commutative bitwise and a−b ≡ a+(−b), so the
  *    lane sequence reproduces the scalar bits op for op.
  *
  * The PQ ADC fold is deliberately NOT vectorized: its inner loop is a
  * table GATHER by code index (D lookups/row), the path already serves
  * 6.7–9k QPS at T=32 (not the bottleneck family), and gather-heavy
  * Vector-API loops on current x86 rarely beat scalar L1-resident
  * lookups — measured priorities per BENCH_NOTES r11.
  *
  * Requires an 8-lane double species (512-bit) — [[SimdSupport]] gates
  * callers; narrower machines use the scalar twins (same bits).
  */
object SimdKernels {
  private val SPD: VectorSpecies[java.lang.Double] =
    DoubleVector.SPECIES_PREFERRED
  private val SPB8: VectorSpecies[java.lang.Byte] = ByteVector.SPECIES_64
  private val SPI8: VectorSpecies[java.lang.Integer] = IntVector.SPECIES_256

  /** Preferred double lane count on this machine. */
  def lanes: Int = SPD.length()

  /** rotT(t·d + r) = rot(r)(t) — the one-time column-major copy that
    * turns the 8 lane loads per t into one contiguous read. */
  def transposed(rot: Array[Array[Double]]): Array[Double] = {
    val d = rot.length
    val out = new Array[Double](d * d)
    var t = 0
    while (t < d) {
      var r = 0
      while (r < d) { out(t * d + r) = rot(r)(t); r += 1 }
      t += 1
    }
    out
  }

  /** Rows [r0, r1) of R·v into out — bit-identical to the scalar
    * `s += R(r,t)·v(t)` loop (see object doc). `rotT` is the
    * [[transposed]] layout; d the dimension. */
  def rotateExact(rotT: Array[Double], d: Int, v: Array[Double],
                  out: Array[Double], r0: Int, r1: Int): Unit = {
    val L = SPD.length()
    var r = r0
    val vecEnd = r0 + ((r1 - r0) / L) * L
    while (r < vecEnd) {
      var acc = DoubleVector.zero(SPD)
      var t = 0
      while (t < d) {
        // (row · v(t)) + acc — scalar's  s = s + row(t)*v(t)  per lane
        acc = DoubleVector.fromArray(SPD, rotT, t * d + r)
          .mul(v(t)).add(acc)
        t += 1
      }
      acc.intoArray(out, r)
      r += L
    }
    while (r < r1) { // tail rows: scalar, same t order
      var s = 0.0
      var t = 0
      while (t < d) { s += rotT(t * d + r) * v(t); t += 1 }
      out(r) = s
      r += 1
    }
  }

  /** Asymmetric SQ8 distances for rows [r0, r1) into out —
    * bit-identical to [[graft.query.LocalServeSq8]]'s scalar fold.
    * `codesT` is column-major (codesT(i·n + r)), n the cell's row
    * count, dim the vector dimension. */
  def sq8DistExact(codesT: Array[Byte], n: Int, dim: Int,
                   localized: Array[Double], mins: Array[Double],
                   scales: Array[Double], out: Array[Double],
                   r0: Int, r1: Int): Unit = {
    val L = SPD.length()
    var r = r0
    val vecEnd = r0 + ((r1 - r0) / L) * L
    while (r < vecEnd) {
      var acc = DoubleVector.zero(SPD)
      var i = 0
      while (i < dim) {
        // bytes → ints (sign-extend, then mask — together the exact
        // `& 0xFF` zero-extension; JDK 17's convertShape rejects the
        // direct ZERO_EXTEND_B2I across shapes) → doubles
        val code = ByteVector.fromArray(SPB8, codesT, i * n + r)
          .convertShape(VectorOperators.B2I, SPI8, 0)
          .asInstanceOf[IntVector].and(0xFF)
          .convertShape(VectorOperators.I2D, SPD, 0)
          .asInstanceOf[DoubleVector]
        // d = loc − (min + code·Δ); acc = d·d + acc — scalar op order
        val dv = DoubleVector.broadcast(SPD, localized(i))
          .sub(code.mul(scales(i)).add(mins(i)))
        acc = dv.mul(dv).add(acc)
        i += 1
      }
      acc.intoArray(out, r)
      r += L
    }
    while (r < r1) { // tail rows: scalar over the same layout/order
      var s = 0.0
      var i = 0
      while (i < dim) {
        val d = localized(i) -
          (mins(i) + (codesT(i * n + r) & 0xFF) * scales(i))
        s += d * d
        i += 1
      }
      out(r) = s
      r += 1
    }
  }
}
