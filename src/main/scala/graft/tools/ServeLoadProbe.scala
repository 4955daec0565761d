package graft.tools

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.pseudoRandomVec
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.LocalServe

/** CONCURRENT-load throughput probe for the warm serving tier — the
  * companion to [[ServeProbe]] (which measures sequential latency): a
  * serving box is provisioned by QPS under concurrency, so this probe
  * drives N client threads over ONE shared pinned store per codec
  * (plain PQ, OPQ, SQ8, RQ, Hamming, filtered) and reports aggregate
  * QPS plus merged p50/p99. The serve classes are immutable after pin
  * (per-call scratch only), so concurrent clients share safely — that
  * property is what this probe exercises. Recorded in BENCH_NOTES.md;
  * rerun ad hoc, not part of the per-round bench.
  *
  * Usage: runMain graft.tools.ServeLoadProbe
  *          [M] [dim] [P] [D] [C] [threads=1,8,32] [qPerThread=500]
  */
object ServeLoadProbe {
  def main(args: Array[String]): Unit = {
    val m = if (args.length > 0) args(0).toInt else 100000
    val dim = if (args.length > 1) args(1).toInt else 1536
    val p = if (args.length > 2) args(2).toInt else 100
    val d = if (args.length > 3) args(3).toInt else 12
    val c = if (args.length > 4) args(4).toInt else 256
    val threadCounts = (if (args.length > 5) args(5) else "1,8,32")
      .split(",").map(_.trim.toInt).toSeq
    val qPerThread = if (args.length > 6) args(6).toInt else 500
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
    println(f"[serveload] build ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val k = 10; val nprobe = 5

    def queryVec(i: Long): Array[Double] = {
      val rnd = new scala.util.Random(i * 2654435761L)
      Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    }

    /** Drive `t` threads × `qPerThread` queries over the shared serve
      * closure; one query stream per thread (disjoint seeds), vectors
      * precomputed so the measured loop is pure serving. */
    def load(name: String, t: Int)(f: (Array[Double], Int) => Long): Unit = {
      val qs = Array.tabulate(t, qPerThread)((ti, qi) =>
        queryVec(1000L + ti.toLong * qPerThread + qi))
      var w = 0 // warm single-thread (JIT + tables)
      while (w < 100) { f(queryVec(w.toLong), w); w += 1 }
      val lats = Array.ofDim[Double](t * qPerThread)
      val start = new CountDownLatch(1)
      val done = new CountDownLatch(t)
      val sinks = new java.util.concurrent.atomic.AtomicLong(0L)
      val workers = (0 until t).map { ti =>
        new Thread(() => {
          start.await()
          var s = 0L
          var i = 0
          while (i < qPerThread) {
            val s0 = System.nanoTime()
            s += f(qs(ti)(i), ti)
            lats(ti * qPerThread + i) = (System.nanoTime() - s0) / 1e6
            i += 1
          }
          sinks.addAndGet(s)
          done.countDown()
        })
      }
      workers.foreach(_.start())
      val w0 = System.nanoTime()
      start.countDown()
      done.await()
      val wall = (System.nanoTime() - w0) / 1e9
      java.util.Arrays.sort(lats)
      def pct(q: Double) = lats(math.min(lats.length - 1,
        (q * lats.length).toInt))
      println(f"[serveload] $name%-10s T=$t%-3d qps=${t * qPerThread / wall}%9.0f " +
        f"p50=${pct(0.50)}%7.3f ms p99=${pct(0.99)}%7.3f ms " +
        f"wall=$wall%6.2f s (sink=${sinks.get()})")
    }

    // plain PQ
    val serve = LocalServe.fromCodes(model, encoded)
    threadCounts.foreach(t => load("PQ", t)((q, _) =>
      serve.query(q, k, nprobe).head._1))

    // filtered: pinned attrs (id mod 10), predicate keeps half the rows
    val withAttr = encoded.withColumn("attr", pmod(col("id"), lit(10L)))
    val fserve = LocalServe.fromCodesWithAttrs(model, withAttr, "attr")
    threadCounts.foreach(t => load("filtered", t)((q, _) =>
      fserve.queryFiltered(q, k, nprobe)(_ < 5L).head._1))

    // OPQ: seeded rotation over the same codes (serving cost only —
    // the ServeProbe rationale; parity with training is gated)
    val rot = ServeProbe.randomOrthonormal(dim, 1234567L)
    val opqServe = LocalServe.fromCodesOpq(
      graft.index.OpqModel(model, rot, Array.empty), encoded)
    threadCounts.foreach(t => load("OPQ", t)((q, _) =>
      opqServe.query(q, k, nprobe).head._1))
    // inline-compute view: same bits, zero future dispatch — measures
    // whether the shared pool is the OPQ concurrency ceiling
    val opqInline = opqServe.withInlineCompute
    threadCounts.foreach(t => load("OPQ-inl", t)((q, _) =>
      opqInline.query(q, k, nprobe).head._1))

    // SQ8
    val (sqModel, sqEnc) = graft.index.IvfSq8.fit(vectors, "id", "vec",
      dim, numPartitions = p)
    val sqServe = graft.query.LocalServeSq8
      .fromCodes(sqModel, sqEnc.localCheckpoint())
    threadCounts.foreach(t => load("SQ8", t)((q, _) =>
      sqServe.query(q, k, nprobe).head._1))
    val sqInline = sqServe.withInlineCompute
    threadCounts.foreach(t => load("SQ8-inl", t)((q, _) =>
      sqInline.query(q, k, nprobe).head._1))

    // RQ
    val (rq, enc2) = graft.index.Rq.fitRefine(encoded, model,
      numDivisions2 = d, numCodes2 = c)
    val rqServe = graft.query.LocalServeRq
      .fromCodes(rq, enc2.localCheckpoint())
    threadCounts.foreach(t => load("RQ", t)((q, _) =>
      rqServe.query(q, k, nprobe).head._1))

    // Hamming signatures (sign bits) over the full corpus
    val hserve = graft.query.LocalServeHamming
      .fromVectors(vectors.select(col("id"),
        col("vec").cast("array<float>").as("vec")), "vec", "id", dim)
    threadCounts.foreach(t => load("hamming", t)((q, _) => {
      val f = new Array[Float](dim)
      var i = 0
      while (i < dim) { f(i) = q(i).toFloat; i += 1 }
      hserve.query(f, k).head._1
    }))

    spark.stop()
  }

}
