package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.pseudoRandomVec
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.{AnnQuery, LocalServe}

/** Warm single-query latency probe for the driver-local serving path —
  * the one axis where the reference's in-process loop beats a Spark
  * job (BASELINE.md: 1.48 ms warm sync / 0.79 ms async at K=10,
  * nprobe=5 over the 100k×1536 store vs a ~100 ms Spark job floor).
  * Builds the SAME index the reference benchmarks (M=100k, N=1536,
  * P=100, D=12, C=256), pins it via [[LocalServe]], and times warm
  * queries at the reference's own K/nprobe. Also times one
  * [[AnnQuery.topK]] job for the cluster-path contrast. Recorded in
  * BENCH_NOTES.md; rerun ad hoc, not part of the per-round bench.
  *
  * Usage: runMain graft.tools.ServeProbe [M] [dim] [P] [D] [C] [nQueries]
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val m = if (args.length > 0) args(0).toInt else 100000
    val dim = if (args.length > 1) args(1).toInt else 1536
    val p = if (args.length > 2) args(2).toInt else 100
    val d = if (args.length > 3) args(3).toInt else 12
    val c = if (args.length > 4) args(4).toInt else 256
    val nq = if (args.length > 5) args(5).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vectors = spark.range(m.toLong)
      .repartition(cpus.toInt * 2)
      .select(col("id"), pseudoRandomVec(col("id"), dim, 42L).as("vec"))
      .localCheckpoint()
    val t0 = System.nanoTime()
    val (model, encoded) = IvfPqBuilder.fit(vectors, "id", "vec", dim,
      IvfPqConfig(numPartitions = p, numDivisions = d, numCodes = c,
        maxIter = 20))
    println(f"[serveprobe] build ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val t1 = System.nanoTime()
    val serve = LocalServe.fromCodes(model, encoded)
    println(f"[serveprobe] pin ${serve.size} codes " +
      f"${(System.nanoTime() - t1) / 1e9}%.1f s")

    // deterministic query stream: the probe vectors themselves
    def queryVec(i: Long): Array[Double] = {
      val rnd = new scala.util.Random(i * 2654435761L)
      Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    }
    val k = 10; val nprobe = 5
    // warmup (JIT + table paths)
    var w = 0
    while (w < 100) { serve.query(queryVec(w.toLong), k, nprobe); w += 1 }
    val lat = new Array[Double](nq)
    var i = 0
    var sink = 0L
    while (i < nq) {
      val q = queryVec(1000L + i)
      val s = System.nanoTime()
      val hits = serve.query(q, k, nprobe)
      lat(i) = (System.nanoTime() - s) / 1e6
      sink += hits.head._1
      i += 1
    }
    java.util.Arrays.sort(lat)
    def pct(q: Double) = lat(math.min(nq - 1, (q * nq).toInt))
    println(f"[serveprobe] warm local query (K=$k nprobe=$nprobe, $nq " +
      f"queries): p50=${pct(0.50)}%.3f ms p90=${pct(0.90)}%.3f ms " +
      f"p99=${pct(0.99)}%.3f ms max=${lat(nq - 1)}%.3f ms " +
      f"mean=${lat.sum / nq}%.3f ms (reference warm: 1.48 ms sync / " +
      f"0.79 ms async; sink=$sink)")

    // cluster-path contrast: one warm Spark job for the same query
    val qj = queryVec(1000L)
    AnnQuery.topK(encoded, model, qj, k, nprobe).collect() // warm plan
    val t2 = System.nanoTime()
    AnnQuery.topK(encoded, model, qj, k, nprobe).collect()
    println(f"[serveprobe] same query as a Spark job: " +
      f"${(System.nanoTime() - t2) / 1e6}%.1f ms (the scheduling floor " +
      f"LocalServe exists to dodge)")

    // shared warm-latency harness for the non-plain codec legs
    def measure(name: String, f: Array[Double] => Long): Unit = {
      var w3 = 0
      while (w3 < 100) { f(queryVec(w3.toLong)); w3 += 1 }
      val lat3 = new Array[Double](nq)
      var i3 = 0
      var sink3 = 0L
      while (i3 < nq) {
        val q = queryVec(1000L + i3)
        val s = System.nanoTime()
        sink3 += f(q)
        lat3(i3) = (System.nanoTime() - s) / 1e6
        i3 += 1
      }
      java.util.Arrays.sort(lat3)
      def p(qq: Double) = lat3(math.min(nq - 1, (qq * nq).toInt))
      println(f"[serveprobe] warm $name local query (K=$k nprobe=$nprobe, " +
        f"$nq queries): p50=${p(0.50)}%.3f ms p90=${p(0.90)}%.3f ms " +
        f"p99=${p(0.99)}%.3f ms mean=${lat3.sum / nq}%.3f ms (sink=$sink3)")
    }
    // OPQ leg: the rotation's d² flops per probe are the only delta vs
    // the plain path, so a SEEDED random orthonormal R over the SAME
    // pinned codes measures the serving cost exactly — no OPQ training
    // (bit-parity with the trained path is gated by ann_opq_local_serve;
    // this probe is about latency, and a driver-local 1536-dim OPQ fit
    // is not a serving-time cost). Rotation rides the probe futures.
    val rot = randomOrthonormal(dim, 1234567L)
    val opqServe = LocalServe.fromCodesOpq(
      graft.index.OpqModel(model, rot, Array.empty), encoded)
    measure("OPQ", q => opqServe.query(q, k, nprobe).head._1)

    // SQ8 leg: full-precision scan of the probed cells' byte codes —
    // dim flops/row instead of D table lookups, the latency/accuracy
    // trade the scalar codec makes
    val (sqModel, sqEnc) = graft.index.IvfSq8.fit(vectors, "id", "vec",
      dim, numPartitions = p)
    val sqServe = graft.query.LocalServeSq8
      .fromCodes(sqModel, sqEnc.localCheckpoint())
    measure("SQ8", q => sqServe.query(q, k, nprobe).head._1)
    val (rq, enc2) = graft.index.Rq.fitRefine(encoded, model,
      numDivisions2 = d, numCodes2 = c)
    val rqServe = graft.query.LocalServeRq
      .fromCodes(rq, enc2.localCheckpoint())
    measure("RQ", q => rqServe.query(q, k, nprobe).head._1)
    spark.stop()
  }

  /** Seeded random orthonormal matrix via modified Gram-Schmidt
    * (shared with [[ServeLoadProbe]] — same seed ⇒ same rotation in
    * both probes' OPQ legs). */
  private[tools] def randomOrthonormal(d: Int,
                                       seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val m = Array.fill(d, d)(rnd.nextGaussian())
    var i = 0
    while (i < d) {
      var j = 0
      while (j < i) {
        var dp = 0.0
        var t = 0
        while (t < d) { dp += m(i)(t) * m(j)(t); t += 1 }
        t = 0
        while (t < d) { m(i)(t) -= dp * m(j)(t); t += 1 }
        j += 1
      }
      var nrm = 0.0
      var t = 0
      while (t < d) { nrm += m(i)(t) * m(i)(t); t += 1 }
      nrm = math.sqrt(nrm)
      require(nrm > 1e-9, "degenerate random row")
      t = 0
      while (t < d) { m(i)(t) /= nrm; t += 1 }
      i += 1
    }
    m
  }
}
