package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.{clusteredVec, pseudoRandomVec}
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.Calibrate

/** Round-14 CLUSTERED-CORPUS benchmark leg (verdict r13 #2): every
  * recorded build/recall number rode `pseudoRandomVec` — near-uniform
  * high-dimensional data whose distances CONCENTRATE, so IVF cells are
  * nearly arbitrary, recall curves flatten artificially, and k-means
  * bound techniques (the r13 Hamerly negative) structurally cannot
  * fire. `clusteredVec` (k tight blobs + uniform noise, deterministic
  * per id) is the counter-shape; this probe records both sides of:
  *
  *   1. the reference-shape build canary (100k×1536, P=100/D=12/C=256)
  *      — does blob structure change build wall?
  *   2. recall-vs-nprobe via `query.Calibrate` (200k×64, P=32) — on
  *      blobs the curve must be STEEP (few cells hold a query's
  *      neighbors) where uniform is shallow;
  *   3. IVF cell-size skew at the same shape — blobs ≠ cells counts
  *      (blobs=48 vs P=32) produce real skew, the input the knn-join
  *      auto-salt telemetry keys on.
  *
  * Usage: runMain graft.tools.Round14ClusteredProbe [leg=all|build|recall]
  */
object Round14ClusteredProbe {
  def main(args: Array[String]): Unit = {
    val leg = if (args.length > 0) args(0) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def vectors(m: Int, vec: Column) = spark.range(m.toLong)
      .repartition(cpus.toInt * 2)
      .select(col("id"), vec.as("vec"))
      .localCheckpoint()

    // ---- leg 1: reference-shape build canary, both corpora ----
    if (leg == "all" || leg == "build") {
      for ((name, vec) <- Seq(
          ("uniform  ", pseudoRandomVec(col("id"), 1536, 42L)),
          ("clustered", clusteredVec(col("id"), 1536, k = 100,
            spread = 0.25, seed = 42L)))) {
        val v = vectors(100000, vec)
        val t0 = System.nanoTime()
        val (_, encoded) = IvfPqBuilder.fit(v, "id", "vec", 1536,
          IvfPqConfig(numPartitions = 100, numDivisions = 12,
            numCodes = 256, maxIter = 20),
          s => println(s"[r14clustered] $name $s"))
        encoded.count()
        println(f"[r14clustered] $name build100k " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        v.unpersist()
      }
    }

    // ---- legs 2+3: recall curve + cell skew, both corpora ----
    if (leg == "all" || leg == "recall") {
      for ((name, vec) <- Seq(
          ("uniform  ", pseudoRandomVec(col("id"), 64, 42L)),
          ("clustered", clusteredVec(col("id"), 64, k = 48,
            spread = 0.25, seed = 42L)))) {
        val v = vectors(200000, vec)
        val (model, encoded) = IvfPqBuilder.fit(v, "id", "vec", 64,
          IvfPqConfig(numPartitions = 32, numDivisions = 8,
            numCodes = 256, maxIter = 20))
        val enc = encoded.localCheckpoint()
        val curve = Calibrate.nprobeRecallCurve(v, "vec", "id", enc,
          model, k = 10, sampleN = 50).collect()
        def at(np: Int) = curve.find(_.getLong(0) == np.toLong)
          .map(_.getDouble(3)).getOrElse(Double.NaN)
        val np90 = curve.find(_.getDouble(3) >= 0.9).map(_.getLong(0)).get
        println(f"[r14clustered] $name recall@1=${at(1)}%.3f @2=${at(2)}%.3f " +
          f"@4=${at(4)}%.3f @8=${at(8)}%.3f @16=${at(16)}%.3f " +
          f"nprobe(0.9)=$np90")
        val sizes = enc.groupBy(col("partition")).count()
          .select(col("count")).collect().map(_.getLong(0)).sorted
        val mean = sizes.sum.toDouble / sizes.length
        println(f"[r14clustered] $name cellsize n=${sizes.length} " +
          f"min=${sizes.head} p50=${sizes(sizes.length / 2)} " +
          f"max=${sizes.last} max/mean=${sizes.last / mean}%.2f")
        v.unpersist()
      }
    }

    spark.stop()
  }
}
