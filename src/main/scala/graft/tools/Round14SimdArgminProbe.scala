package graft.tools

import jdk.incubator.vector.{DoubleVector, VectorOperators, VectorSpecies}

/** Round-14 SIMD argmin probe: can a Vector-API "lanes across
  * CENTROIDS" argmin beat the scalar blocked-early-abandon loop that
  * the k-means assignment (LocalKMeans.lloyd / assignResiduals) and the
  * distributed kernels (nearestCentroidL2, pqEncodeF) all share?
  *
  * Lane construction for bit-identity: lane c accumulates
  * acc = (diff*diff) + acc in ascending dim order — exactly the scalar
  * per-centroid op sequence (separate MUL/ADD, no FMA), so each lane's
  * final sum is bit-equal to the scalar sum and the argmin (ties to
  * lowest index) is identical. Early abandon becomes GROUP abandon:
  * after each 32-dim block, if every lane already exceeds the current
  * best, the group stops — abandon only skips losing work, results
  * unchanged.
  *
  * Shapes probed (the two hot assignment shapes):
  *   - PQ codebook fit:   n=65536, dim=128, k=256 (×20 iters in build)
  *   - coarse assignment: n=16384, dim=1536, k=100
  *
  * Usage: runMain graft.tools.Round14SimdArgminProbe
  */
object Round14SimdArgminProbe {
  private val SPD: VectorSpecies[java.lang.Double] =
    DoubleVector.SPECIES_PREFERRED

  /** Current scalar shape: flat row-major table, blocked early abandon. */
  def scalarArgmin(pd: Array[Double], flat: Array[Double], k: Int,
                   dim: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val base = c * dim
      var s = 0.0
      var i = 0
      while (i < dim && s < bestD) {
        val end = math.min(i + 32, dim)
        while (i < end) {
          val x = pd(i) - flat(base + i)
          s += x * x
          i += 1
        }
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** SIMD: transposed table flatT(j*k + c), lanes across centroids,
    * sequential over dim per lane, group abandon per 32-dim block. */
  def simdArgmin(pd: Array[Double], flatT: Array[Double], k: Int,
                 dim: Int, acc: Array[Double]): Int = {
    val L = SPD.length()
    var best = 0
    var bestD = Double.MaxValue
    var c0 = 0
    val vecEnd = (k / L) * L
    while (c0 < vecEnd) {
      var accV = DoubleVector.zero(SPD)
      var j = 0
      var abandoned = false
      while (j < dim && !abandoned) {
        val end = math.min(j + 32, dim)
        while (j < end) {
          val cv = DoubleVector.fromArray(SPD, flatT, j * k + c0)
          val d = DoubleVector.broadcast(SPD, pd(j)).sub(cv)
          accV = d.mul(d).add(accV)
          j += 1
        }
        if (j < dim &&
            accV.compare(VectorOperators.GE, bestD).allTrue()) abandoned = true
      }
      if (!abandoned) {
        accV.intoArray(acc, 0)
        var l = 0
        while (l < L) {
          if (acc(l) < bestD) { bestD = acc(l); best = c0 + l }
          l += 1
        }
      } else {
        // lanes all ≥ bestD: no candidate in this group can win
      }
      c0 += L
    }
    // tail centroids: scalar over the transposed layout, same op order
    var c = vecEnd
    while (c < k) {
      var s = 0.0
      var j = 0
      while (j < dim && s < bestD) {
        val end = math.min(j + 32, dim)
        while (j < end) {
          val x = pd(j) - flatT(j * k + c)
          s += x * x
          j += 1
        }
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  def main(args: Array[String]): Unit = {
    println(s"[simdprobe] preferred lanes = ${SPD.length()}")
    val rnd = new java.util.Random(42)

    def shape(name: String, n: Int, dim: Int, k: Int): Unit = {
      val data = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
      val cent = Array.fill(k)(Array.fill(dim)(rnd.nextDouble()))
      val flat = new Array[Double](k * dim)
      for (c <- 0 until k) System.arraycopy(cent(c), 0, flat, c * dim, dim)
      val flatT = new Array[Double](k * dim)
      for (c <- 0 until k; j <- 0 until dim) flatT(j * k + c) = cent(c)(j)

      val pd = new Array[Double](dim)
      val acc = new Array[Double](SPD.length())
      def widen(v: Array[Float]): Unit = {
        var i = 0; while (i < dim) { pd(i) = v(i).toDouble; i += 1 }
      }

      // warm both paths
      for (r <- 0 until math.min(n, 4096)) {
        widen(data(r))
        scalarArgmin(pd, flat, k, dim); simdArgmin(pd, flatT, k, dim, acc)
      }

      var mismatches = 0
      for (rep <- 0 until 3) {
        var t0 = System.nanoTime()
        var sAcc = 0L
        var r = 0
        while (r < n) {
          widen(data(r)); sAcc += scalarArgmin(pd, flat, k, dim); r += 1
        }
        val tScalar = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        var vAcc = 0L
        r = 0
        while (r < n) {
          widen(data(r)); vAcc += simdArgmin(pd, flatT, k, dim, acc); r += 1
        }
        val tSimd = (System.nanoTime() - t0) / 1e9
        if (rep == 0) {
          var i = 0
          while (i < n) {
            widen(data(i))
            if (scalarArgmin(pd, flat, k, dim) !=
                simdArgmin(pd, flatT, k, dim, acc)) mismatches += 1
            i += 1
          }
        }
        println(f"[simdprobe] $name rep$rep scalar=$tScalar%6.3f s " +
          f"simd=$tSimd%6.3f s speedup=${tScalar / tSimd}%5.2f " +
          f"(argmin sums s=$sAcc v=$vAcc) mismatches=$mismatches")
      }
    }

    shape("pq-fit    n=65536 d=128  k=256", 65536, 128, 256)
    shape("coarse    n=16384 d=1536 k=100", 16384, 1536, 100)
    shape("ivf-assign n=16384 d=1536 k=100", 16384, 1536, 100)
  }
}
