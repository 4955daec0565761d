package graft.tools

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

/** Round-14 accessor probe: the distributed kernels
  * (nearestCentroidL2, pqEncodeF, subCentroidF) read their centroid /
  * codebook PLAN LITERALS element-by-element through
  * `UnsafeArrayData.getDouble` inside the hot argmin loops. The
  * driver-local fits (LocalKMeans) use plain `Array[Double]` tables,
  * which C2 can auto-vectorize inside the 32-element abandon blocks;
  * Unsafe loads usually cannot. This probe measures the SAME scalar
  * blocked-early-abandon argmin against (a) an UnsafeArrayData table
  * (today's kernel) and (b) a per-thread widened primitive copy (the
  * proposed `widenLit` cache) at the two hot shapes.
  *
  * Usage: runMain graft.tools.Round14AccessorProbe
  */
object Round14AccessorProbe {

  def argminUnsafe(pd: Array[Double], flat: UnsafeArrayData, k: Int,
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
          val x = pd(i) - flat.getDouble(base + i)
          s += x * x
          i += 1
        }
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  def argminPrim(pd: Array[Double], flat: Array[Double], k: Int,
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

  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    def shape(name: String, n: Int, dim: Int, k: Int): Unit = {
      val data = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
      val flat = Array.fill(k * dim)(rnd.nextDouble())
      val unsafe = UnsafeArrayData.fromPrimitiveArray(flat)
      val pd = new Array[Double](dim)
      def widen(v: Array[Float]): Unit = {
        var i = 0; while (i < dim) { pd(i) = v(i).toDouble; i += 1 }
      }
      for (r <- 0 until math.min(n, 4096)) {
        widen(data(r))
        argminUnsafe(pd, unsafe, k, dim); argminPrim(pd, flat, k, dim)
      }
      for (rep <- 0 until 3) {
        var t0 = System.nanoTime()
        var aU = 0L
        var r = 0
        while (r < n) { widen(data(r)); aU += argminUnsafe(pd, unsafe, k, dim); r += 1 }
        val tU = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        var aP = 0L
        r = 0
        while (r < n) { widen(data(r)); aP += argminPrim(pd, flat, k, dim); r += 1 }
        val tP = (System.nanoTime() - t0) / 1e9
        println(f"[accprobe] $name rep$rep unsafe=$tU%6.3f s prim=$tP%6.3f s " +
          f"speedup=${tU / tP}%5.2f (sums $aU/$aP)")
      }
    }
    shape("ivf-assign d=1536 k=100", 16384, 1536, 100)
    shape("pq-encode  d=128  k=256", 65536, 128, 256)
  }
}
