package graft.tools

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.pseudoRandomVec
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.{LocalServe, LocalServeLazy, ServeRouter}

/** Round-13 serving probes (BENCH_NOTES):
  *
  *  1. MIXED COLD/WARM on the LAZY tier — the round-12 verdict's defect
  *     leg: T warm clients loop over queries whose cells are already
  *     resident while a disturber thread keeps probing UNSEEN cells
  *     (each probe forces a Spark cold-load scan). Under the old
  *     pin-lock design every warm query stalled behind each cold scan
  *     (~1 s p99 whenever the hot set shifted); under [[LazyResidency]]
  *     the warm path is lock-free, so warm p50/p99 must stay ~ms WHILE
  *     cold loads run. The probe prints warm percentiles measured
  *     strictly inside the disturbance window, plus the cold-load count
  *     that window produced.
  *
  *  2. SHARDED ROUTER ceiling — [[ServeRouter]] over 2 and 4
  *     cell-disjoint in-process shards vs the single box at T=32. In
  *     ONE JVM the shards share the arithmetic units, so QPS is
  *     expected ~flat (the r12 OPQ A/B showed the box saturates on
  *     compute/bandwidth); the router's throughput claim is for shards
  *     on separate boxes. This leg documents that in-process ceiling
  *     and the router's added merge cost.
  *
  * Usage: runMain graft.tools.Round13ServeProbe [M=200000] [dim=64]
  *          [P=32] [D=8] [C=256]
  */
object Round13ServeProbe {
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
    val store = java.nio.file.Files.createTempDirectory("r13_store").toString
    IvfPqBuilder.save(model, encoded, store)
    println(f"[r13serve] build+save ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // one representative vector per cell (its member probes it first at
    // nprobe=1) — the instrument for cell-targeted cold touches
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

    // ---- leg 1: mixed cold/warm on the lazy tier ----
    {
      val lazySrv = LocalServeLazy.fromStore(spark, store)
      val hotCells = allCells.take(8)
      val coldCells = allCells.drop(8)
      // warm the hot set (and JIT) — nprobe=4 pins each rep's 4 cells
      hotCells.foreach(cl => lazySrv.query(cellRep(cl), k, 4))
      val warmQs = hotCells.map(cellRep).toArray
      var w = 0
      while (w < 2000) { // JIT warmup on the warm path
        lazySrv.query(warmQs(w % warmQs.length), k, 4); w += 1
      }
      val loadsBefore = lazySrv.coldLoads
      val stop = new AtomicBoolean(false)
      val coldDone = new CountDownLatch(1)
      val coldLoadsSeen = new AtomicLong(0)
      val disturber = new Thread(() => {
        // keep forcing UNSEEN cells — each is one pruned Spark scan
        coldCells.foreach { cl =>
          if (!stop.get()) {
            lazySrv.query(cellRep(cl), k, 1)
            Thread.sleep(20)
          }
        }
        coldLoadsSeen.set(lazySrv.coldLoads - loadsBefore)
        coldDone.countDown()
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
          // run until the disturber finishes its cold sweep
          while (coldDone.getCount > 0 && i < perThread) {
            val s0 = System.nanoTime()
            lazySrv.query(warmQs((ti + i) % warmQs.length), k, 4)
            lats(ti * perThread + i) = (System.nanoTime() - s0) / 1e6
            i += 1
          }
          counts(ti) = i
        })
      }
      workers.foreach(_.start())
      disturber.start()
      start.countDown()
      coldDone.await()
      stop.set(true)
      workers.foreach(_.join())
      val measured = (0 until warmThreads).flatMap(ti =>
        (0 until counts(ti)).map(i => lats(ti * perThread + i))).sorted
      def pct(q: Double) = measured(math.min(measured.length - 1,
        (q * measured.length).toInt))
      println(f"[r13serve] lazy-mixed warmN=${measured.length} " +
        f"p50=${pct(0.50)}%7.3f ms p90=${pct(0.90)}%7.3f ms " +
        f"p99=${pct(0.99)}%7.3f ms max=${measured.last}%8.3f ms " +
        f"coldLoadsDuring=${coldLoadsSeen.get()}")
    }

    // ---- leg 2: sharded router in-process ceiling ----
    {
      val single = LocalServe.fromStore(spark, store)
      def routerOver(n: Int): ServeRouter = {
        val shards = (0 until n).map(si =>
          LocalServe.fromStore(spark, store,
            allCells.filter(_ % n == si)))
        ServeRouter(model, shards)
      }
      val qs = Array.tabulate(2000)(i => cellRep(allCells(i % allCells.size)))
      def qps(name: String, f: Array[Double] => Long): Unit = {
        var w = 0
        while (w < 2000) { f(qs(w % qs.length)); w += 1 } // warmup
        val t = 32; val perT = 500
        val start = new CountDownLatch(1)
        val done = new CountDownLatch(t)
        val sink = new AtomicLong(0)
        (0 until t).foreach { ti =>
          new Thread(() => {
            start.await()
            var s = 0L; var i = 0
            while (i < perT) { s += f(qs((ti * perT + i) % qs.length)); i += 1 }
            sink.addAndGet(s); done.countDown()
          }).start()
        }
        val w0 = System.nanoTime()
        start.countDown(); done.await()
        val wall = (System.nanoTime() - w0) / 1e9
        println(f"[r13serve] $name%-12s T=32 qps=${t * perT / wall}%9.0f " +
          f"wall=$wall%6.2f s (sink=${sink.get()})")
      }
      qps("single", q => single.query(q, k, 4).head._1)
      qps("router-2", { val r = routerOver(2); q => r.query(q, k, 4).head._1 })
      qps("router-4", { val r = routerOver(4); q => r.query(q, k, 4).head._1 })
    }

    spark.stop()
  }
}
