package graft.tools

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.pseudoRandomVec
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.{LocalServe, RemoteShards, ServeRouter, ShardProcess}

/** Round-14 PROCESS-BOUNDARY fleet load probe — the measurement leg the
  * r13 verdict asked to ship with the transport (verdict r13 #1): drive
  * the [[ServeRouter]] over REAL shard-server JVMs (each loading its
  * cells from the saved store itself, [[ShardServerMain]]) under
  * concurrent client load, against the single box and the in-process
  * router forms.
  *
  * HONEST CAVEAT, stated up front: every JVM here shares ONE box's
  * CPUs, so remote-fleet QPS CANNOT exceed the single-box ceiling on
  * this hardware — the in-process r13 leg already showed the box
  * saturates on compute. What this leg DOES measure truthfully:
  *   - the wire's per-query latency cost (sequential p50 local vs
  *     remote — frame encode/decode + loopback round-trip);
  *   - that the transport holds bit-parity and stays stable under
  *     T=32 concurrent clients hammering pooled connections;
  *   - the throughput RETAINED through the process boundary (remote
  *     QPS / in-process QPS) — the number that, on separate boxes,
  *     scales by shard count instead of being capped by this one.
  *
  * Usage: runMain graft.tools.Round14RemoteLoadProbe [M=200000] [dim=64]
  *          [P=32] [D=8] [C=256]
  */
object Round14RemoteLoadProbe {
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
    val store = java.nio.file.Files.createTempDirectory("r14_fleet").toString
    IvfPqBuilder.save(model, encoded, store)
    println(f"[r14fleet] build+save ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val single = LocalServe.fromStore(spark, store)
    val allCells = single.cells
    val evenCells = allCells.filter(_ % 2 == 0)
    val oddCells = allCells.filter(_ % 2 == 1)
    val k = 10; val nprobe = 4

    def queryVec(i: Long): Array[Double] = {
      val rnd = new scala.util.Random(i * 2654435761L)
      Array.fill(dim)(rnd.nextDouble())
    }
    val qs = Array.tabulate(2000)(i => queryVec(i.toLong))

    val routerLocal = ServeRouter(model,
      Seq(LocalServe.fromStore(spark, store, evenCells),
        LocalServe.fromStore(spark, store, oddCells)))

    println("[r14fleet] launching 2 shard JVMs (own SparkSession + " +
      "store load each)…")
    val h1 = ShardProcess.launch(store, "pq", evenCells, cpus = 8)
    val h2 = ShardProcess.launch(store, "pq", oddCells, cpus = 8)
    val r1 = RemoteShards.pq("127.0.0.1", h1.port)
    val r2 = RemoteShards.pq("127.0.0.1", h2.port)
    val routerRemote = ServeRouter(model, Seq(r1, r2))

    try {
      // bit-parity under load comes from the gate/spec; spot-check here
      val spot = qs.take(50).forall { q =>
        routerRemote.query(q, k, nprobe).toSeq ==
          routerLocal.query(q, k, nprobe).toSeq
      }
      println(s"[r14fleet] spot parity over 50 queries: $spot")
      require(spot, "remote router diverged from in-process router")

      def seqP50(name: String, f: Array[Double] => Unit): Unit = {
        var w = 0
        while (w < 2000) { f(qs(w % qs.length)); w += 1 } // JIT + pool warm
        val lats = Array.tabulate(2000) { i =>
          val s0 = System.nanoTime()
          f(qs(i % qs.length))
          (System.nanoTime() - s0) / 1e6
        }.sorted
        println(f"[r14fleet] $name%-14s seq p50=${lats(1000)}%7.3f ms " +
          f"p99=${lats(1980)}%7.3f ms")
      }
      seqP50("single", q => { single.query(q, k, nprobe); () })
      seqP50("router-local", q => { routerLocal.query(q, k, nprobe); () })
      seqP50("router-remote", q => { routerRemote.query(q, k, nprobe); () })

      def qps(name: String, f: Array[Double] => Long): Unit = {
        var w = 0
        while (w < 2000) { f(qs(w % qs.length)); w += 1 }
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
        println(f"[r14fleet] $name%-14s T=32 qps=${t * perT / wall}%9.0f " +
          f"wall=$wall%6.2f s (sink=${sink.get()})")
      }
      qps("single", q => single.query(q, k, nprobe).head._1)
      qps("router-local", q => routerLocal.query(q, k, nprobe).head._1)
      qps("router-remote", q => routerRemote.query(q, k, nprobe).head._1)
      println("[r14fleet] caveat: all JVMs share this box's CPUs — " +
        "remote QPS here is the RETENTION through the wire, not the " +
        "separate-box scaling number")
    } finally {
      try { r1.close(); r2.close() } finally { h1.close(); h2.close() }
    }
    spark.stop()
  }
}
