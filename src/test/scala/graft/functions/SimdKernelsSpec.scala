package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the Vector-API serve kernels vs the scalar loops they
  * replace — the ship condition from the round-11 verdict (#5): results
  * must be BIT-identical (strict per-lane FP order, no FMA), or the
  * change doesn't ship. Exercised over random dims including non-lane-
  * multiple tails and denormal-ish magnitudes. */
class SimdKernelsSpec extends AnyFunSuite {

  private def assumeSimd(): Unit =
    assume(SimdSupport.available,
      "Vector API unavailable or not 8-lane on this JVM — scalar paths serve")

  test("rotateExact == the scalar mat-vec loop, bit for bit, " +
      "including tail rows") {
    assumeSimd()
    val rnd = new scala.util.Random(42)
    for (d <- Seq(3, 8, 17, 64, 130)) {
      val rot = Array.fill(d, d)(rnd.nextDouble() * 2e3 - 1e3)
      val v = Array.fill(d)(rnd.nextDouble() * 2 - 1)
      val rotT = SimdKernels.transposed(rot)
      val got = new Array[Double](d)
      SimdKernels.rotateExact(rotT, d, v, got, 0, d)
      val want = Array.tabulate(d) { r =>
        var s = 0.0
        var t = 0
        while (t < d) { s += rot(r)(t) * v(t); t += 1 }
        s
      }
      (0 until d).foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(got(r)) ===
          java.lang.Double.doubleToRawLongBits(want(r)),
          s"rotate bit mismatch at d=$d row=$r: ${got(r)} vs ${want(r)}")
      }
      // sub-range calls (the block-chunked future shape) agree too
      val part = new Array[Double](d)
      SimdKernels.rotateExact(rotT, d, v, part, d / 3, d)
      (d / 3 until d).foreach(r => assert(part(r) === got(r)))
    }
  }

  test("sq8DistExact == the scalar asymmetric fold, bit for bit, " +
      "unsigned bytes included") {
    assumeSimd()
    val rnd = new scala.util.Random(7)
    for ((n, dim) <- Seq((5, 4), (16, 16), (37, 64), (100, 13))) {
      val codesRow = Array.fill(n * dim)((rnd.nextInt(256) - 128).toByte)
      val codesT = new Array[Byte](n * dim)
      for (r <- 0 until n; i <- 0 until dim)
        codesT(i * n + r) = codesRow(r * dim + i)
      val loc = Array.fill(dim)(rnd.nextDouble() * 4 - 2)
      val mins = Array.fill(dim)(rnd.nextDouble() - 0.5)
      val scales = Array.fill(dim)(rnd.nextDouble() / 255.0)
      val got = new Array[Double](n)
      SimdKernels.sq8DistExact(codesT, n, dim, loc, mins, scales, got, 0, n)
      val want = Array.tabulate(n) { r =>
        var s = 0.0
        var i = 0
        while (i < dim) {
          val d = loc(i) - (mins(i) + (codesRow(r * dim + i) & 0xFF) * scales(i))
          s += d * d
          i += 1
        }
        s
      }
      (0 until n).foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(got(r)) ===
          java.lang.Double.doubleToRawLongBits(want(r)),
          s"sq8 bit mismatch at n=$n dim=$dim row=$r")
      }
    }
  }
}
