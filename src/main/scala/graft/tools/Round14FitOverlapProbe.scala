package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.{clusteredVec, pseudoRandomVec}
import graft.index.LocalKMeans

/** Round-14 PQ-fit OVERLAP probe (verdict r13 #3): pq-kmeans-all is
  * ~2/3 of the clean 100k build (the D=12 sequential 128-dim C=256
  * fits). Each fit parallelizes over 256-point chunks, so the open
  * question is per-fit parallel EFFICIENCY: do iteration barriers +
  * chunk stragglers idle the 32-thread pool enough that overlapping
  * 2–4 of the (independent, per-division-seeded) fits wins wall-clock?
  *
  * Measures, at the exact build shape (65,536 sample × 128-dim slices,
  * C=256, maxIter=20, the 1536-dim corpus' 12 divisions):
  *   - sequential wall (the current IvfPq.fit shape) — per-fit and sum;
  *   - overlapped wall at W ∈ {2, 3, 4} worker threads pulling fit
  *     indices (each fit's inner parChunks still fans to the shared
  *     pool);
  *   - DETERMINISM: overlapped centroids must be bit-identical to
  *     sequential (each fit is a pure function of (slice, seed + dI) —
  *     concurrency must not leak in; partial merges are range-ordered).
  *
  * Run on BOTH corpus shapes — pseudoRandomVec (the recorded bench
  * corpus; early-abandon weak, every chunk costs the same) and
  * clusteredVec (blobs; early-abandon strong and chunk costs skew by
  * cluster mix, where straggler bubbles would show).
  *
  * Usage: runMain graft.tools.Round14FitOverlapProbe [n=65536]
  *          [dim=1536] [divisions=12] [C=256]
  */
object Round14FitOverlapProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 65536
    val dim = if (args.length > 1) args(1).toInt else 1536
    val d = if (args.length > 2) args(2).toInt else 12
    val c = if (args.length > 3) args(3).toInt else 256
    val subDim = dim / d
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(name: String, vec: org.apache.spark.sql.Column): Unit = {
      val sample = spark.range(n.toLong)
        .select(vec.as("vec")).as[Array[Float]].collect()
      // the D division slices, exactly as IvfPq.fit cuts them
      val slices = (0 until d).map { dI =>
        sample.map(r =>
          java.util.Arrays.copyOfRange(r, dI * subDim, (dI + 1) * subDim))
      }
      // JIT warm on a throwaway fit
      LocalKMeans.fit(slices(0), c, 20, 1e-6, seed = 999L, init = "random")

      def fitOne(dI: Int) =
        LocalKMeans.fit(slices(dI), c, 20, 1e-6, seed = 42L + dI,
          init = "random")

      // sequential (the shipped shape)
      val seqT0 = System.nanoTime()
      val perFit = new Array[Double](d)
      val seqResults = (0 until d).map { dI =>
        val t = System.nanoTime()
        val r = fitOne(dI)
        perFit(dI) = (System.nanoTime() - t) / 1e9
        r
      }
      val seqWall = (System.nanoTime() - seqT0) / 1e9
      println(f"[r14fitoverlap] $name seq wall=$seqWall%6.1f s " +
        f"perFit min=${perFit.min}%5.2f max=${perFit.max}%5.2f " +
        f"iters=${seqResults.map(_.iters).min}..${seqResults.map(_.iters).max}")

      for (w <- Seq(2, 3, 4, 6, 8)) {
        val results = new Array[LocalKMeans.KmResult](d)
        val next = new AtomicInteger(0)
        val t0 = System.nanoTime()
        val workers = (0 until w).map { _ =>
          val t = new Thread(() => {
            var i = next.getAndIncrement()
            while (i < d) {
              results(i) = fitOne(i)
              i = next.getAndIncrement()
            }
          })
          t.start(); t
        }
        workers.foreach(_.join())
        val wall = (System.nanoTime() - t0) / 1e9
        val identical = (0 until d).forall { dI =>
          val a = seqResults(dI); val b = results(dI)
          a.iters == b.iters && a.centroids.length == b.centroids.length &&
            a.centroids.indices.forall(ci =>
              java.util.Arrays.equals(a.centroids(ci), b.centroids(ci)))
        }
        println(f"[r14fitoverlap] $name W=$w wall=$wall%6.1f s " +
          f"(x${seqWall / wall}%.2f vs seq) bitIdentical=$identical")
      }
    }

    corpus("uniform  ", pseudoRandomVec(col("id"), dim, 42L))
    corpus("clustered", clusteredVec(col("id"), dim, k = 100,
      spread = 0.25, seed = 42L))
    spark.stop()
  }
}
