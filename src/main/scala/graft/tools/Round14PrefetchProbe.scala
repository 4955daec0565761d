package graft.tools

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.pseudoRandomVec
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.LocalServeLazy

/** Round-14 lazy-tier PREFETCH probe (BENCH_NOTES): the r13 verdict's
  * remaining lazy-tier cost was the cold FIRST query (~1 s — one pruned
  * Spark scan) before the residency warms. [[LazyResidency.prefetch]]
  * pins a predicted hot set in the background through the same
  * shared-promise machinery as a cold query; this probe measures:
  *
  *  1. COLD vs PREFETCHED first query — the same first query against a
  *     fresh lazy open, without and with a completed prefetch of its
  *     cells. The prefetched form must land in the warm-path band
  *     (~1 ms), eliminating the cold scan from the query's critical
  *     path (the scan still happens — inside the prefetch).
  *  2. WARM TRAFFIC DURING A RUNNING PREFETCH — warm clients loop on a
  *     resident hot set while a background thread prefetches every
  *     remaining cell; warm p50/p99 must stay in the lock-free band
  *     (the prefetch loads outside locks), and the total cold-load
  *     count must equal the cell count exactly (prefetch and queries
  *     share loads — nothing double-loads).
  *
  * Usage: runMain graft.tools.Round14PrefetchProbe [M=200000] [dim=64]
  *          [P=32] [D=8] [C=256]
  */
object Round14PrefetchProbe {
  def main(args: Array[String]): Unit = {
    val m = if (args.length > 0) args(0).toInt else 200000
    val dim = if (args.length > 1) args(1).toInt else 64
    val p = if (args.length > 2) args(2).toInt else 32
    val d = if (args.length > 3) args(3).toInt else 8
    val c = if (args.length > 4) args(4).toInt else 256
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
    val store = java.nio.file.Files.createTempDirectory("r14_store").toString
    IvfPqBuilder.save(model, encoded, store)
    println(f"[r14prefetch] build+save ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // one representative vector per cell (probes its own cell first)
    val repRows = encoded.groupBy(col("partition"))
      .agg(min(col("id")).as("id"))
      .join(vectors, "id")
      .select(col("partition"), col("vec"))
      .collect()
    val cellRep: Map[Int, Array[Double]] = repRows.map { r =>
      r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toMap
    val allCells = cellRep.keys.toSeq.sorted
    val k = 10
    val nprobe = 4

    def cellsOf(srv: LocalServeLazy, q: Array[Double]): Seq[Int] =
      graft.query.AnnQuery.selectPartitions(srv.model, q, nprobe)
        .map(_._1).toSeq

    // ---- leg 1: cold first query vs prefetched first query ----
    {
      val q = cellRep(allCells.head)
      // JIT-warm the query path on a throwaway tier first so leg 1
      // times the SCAN, not classloading
      val jit = LocalServeLazy.fromStore(spark, store)
      jit.query(q, k, nprobe)
      var w = 0
      while (w < 2000) { jit.query(q, k, nprobe); w += 1 }

      val coldSrv = LocalServeLazy.fromStore(spark, store)
      val c0 = System.nanoTime()
      coldSrv.query(q, k, nprobe)
      val coldMs = (System.nanoTime() - c0) / 1e6

      val preSrv = LocalServeLazy.fromStore(spark, store)
      val p0 = System.nanoTime()
      preSrv.prefetch(cellsOf(preSrv, q))
      val prefetchMs = (System.nanoTime() - p0) / 1e6
      val f0 = System.nanoTime()
      preSrv.query(q, k, nprobe)
      val firstMs = (System.nanoTime() - f0) / 1e6
      println(f"[r14prefetch] first-query cold=$coldMs%8.1f ms | " +
        f"prefetch=$prefetchMs%8.1f ms then first=$firstMs%6.3f ms " +
        f"(coldLoads=${preSrv.coldLoads})")
    }

    // ---- leg 2: warm traffic during a background prefetch ----
    {
      val srv = LocalServeLazy.fromStore(spark, store)
      val hotCells = allCells.take(8)
      hotCells.foreach(cl => srv.query(cellRep(cl), k, nprobe))
      val warmQs = hotCells.map(cellRep).toArray
      var w = 0
      while (w < 2000) { srv.query(warmQs(w % warmQs.length), k, nprobe); w += 1 }
      val residentBefore = srv.cells.toSet
      val toPrefetch = allCells.filterNot(residentBefore)
      val loadsBefore = srv.coldLoads

      val prefetchDone = new CountDownLatch(1)
      val prefetchMsBox = new java.util.concurrent.atomic.AtomicLong(0)
      val prefetcher = new Thread(() => {
        val t = System.nanoTime()
        srv.prefetch(toPrefetch)
        prefetchMsBox.set((System.nanoTime() - t) / 1000000L)
        prefetchDone.countDown()
      })
      val warmThreads = 8
      val perThread = 40000
      val lats = Array.ofDim[Double](warmThreads * perThread)
      val counts = new Array[Int](warmThreads)
      val start = new CountDownLatch(1)
      val workers = (0 until warmThreads).map { ti =>
        new Thread(() => {
          start.await()
          var i = 0
          while (prefetchDone.getCount > 0 && i < perThread) {
            val s0 = System.nanoTime()
            srv.query(warmQs((ti + i) % warmQs.length), k, nprobe)
            lats(ti * perThread + i) = (System.nanoTime() - s0) / 1e6
            i += 1
          }
          counts(ti) = i
        })
      }
      workers.foreach(_.start())
      prefetcher.start()
      start.countDown()
      prefetchDone.await()
      workers.foreach(_.join())
      val measured = (0 until warmThreads).flatMap(ti =>
        (0 until counts(ti)).map(i => lats(ti * perThread + i))).sorted
      def pct(q: Double) = measured(math.min(measured.length - 1,
        (q * measured.length).toInt))
      val loadsDuring = srv.coldLoads - loadsBefore
      println(f"[r14prefetch] warm-during-prefetch warmN=${measured.length} " +
        f"p50=${pct(0.50)}%7.3f ms p90=${pct(0.90)}%7.3f ms " +
        f"p99=${pct(0.99)}%7.3f ms max=${measured.last}%8.3f ms | " +
        f"prefetch=${prefetchMsBox.get()} ms cells=${toPrefetch.length} " +
        f"coldLoads=$loadsDuring (must equal cells — shared, not doubled)")
    }

    spark.stop()
  }
}
