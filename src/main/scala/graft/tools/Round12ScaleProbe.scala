package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 scale canaries:
  *
  *  1. semDeDup's cell sum-vector join under the MEASURED strategy
  *     (round-11 verdict minor #1): a paper-scale cell relation
  *     (160k cells × 640 dims ≈ 102M elements — past the 100M element
  *     ceiling) must NOT broadcast (shuffle-hash on the cell key), while
  *     a metadata-sized one (1k × 64) must. The probe executes both and
  *     greps the adaptive executed plan for the join node that actually
  *     ran.
  *  2. LocalServeLazy cold-vs-warm latency (round-11 verdict next-round
  *     #4): first-probe pin cost vs steady-state warm latency vs the
  *     eager pin's up-front wall, on a 200k×64 store.
  *
  * Usage: runMain graft.tools.Round12ScaleProbe [filter]
  */
object Round12ScaleProbe {
  def main(args: Array[String]): Unit = {
    val filter = if (args.nonEmpty)
      args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.FastFunctions.pseudoRandomVec

    def run(name: String)(f: => Unit): Unit =
      if (filter.isEmpty || filter.exists(name.contains)) {
        val t0 = System.nanoTime()
        f
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s total")
      }

    def semLeg(cells: Long, dim: Int, membersPerCell: Int): Unit = {
      val n = cells * membersPerCell
      // member m of cell c has id c*membersPerCell + m; pair the first
      // two members of the first 1000 cells (equal-cell scoping holds)
      val emb = spark.range(n).repartition(64)
        .select(col("id"),
          (col("id") / membersPerCell).cast("long").as("cell"),
          pseudoRandomVec(col("id"), dim, 7L).as("vec"))
      val prs = spark.range(1000L)
        .select((col("id") * membersPerCell).as("a_id"),
          (col("id") * membersPerCell + 1).as("b_id"))
      val out = graft.pipeline.Dedup.semDeDup(emb, "id", "vec", "cell", prs)
      val kept = out.agg(sum(col("keep"))).collect()(0).getLong(0)
      val plan = out.queryExecution.executedPlan.toString
      val shuffled = plan.contains("ShuffledHashJoin")
      val broadcastJoins =
        "BroadcastHashJoin".r.findAllIn(plan).length
      println(s"  cells=$cells dim=$dim (elements=${cells * dim}): " +
        s"kept=$kept shuffleHashPresent=$shuffled " +
        s"broadcastJoins=$broadcastJoins")
    }

    run("semDeDup cell-side strategy, PAPER scale (160k cells x 640d " +
        "= 102M elements > ceiling): expect shuffle-hash") {
      semLeg(160000L, 640, 2)
    }
    run("semDeDup cell-side strategy, metadata scale (1k cells x 64d): " +
        "expect broadcast") {
      semLeg(1000L, 64, 100)
    }

    run("LocalServeLazy cold vs warm vs eager pin, 200k x 64, P=32") {
      import graft.index.{IvfPqBuilder, IvfPqConfig}
      val vecs = spark.range(200000L).repartition(32)
        .select(col("id"),
          pseudoRandomVec(col("id"), 64, 42L).cast("array<float>").as("vec"))
      val (model, encoded) = IvfPqBuilder.fit(vecs, "id", "vec", 64,
        IvfPqConfig(numPartitions = 32, numDivisions = 16, numCodes = 256,
          maxIter = 10))
      val dir = java.nio.file.Files.createTempDirectory("lazy_serve").toString
      IvfPqBuilder.save(model, encoded, dir)
      def q(i: Long): Array[Double] = {
        val rnd = new scala.util.Random(i)
        Array.fill(64)(rnd.nextDouble() * 2 - 1)
      }
      // eager pin: everything up front
      val t0 = System.nanoTime()
      val eager = graft.query.LocalServe.fromStore(spark, dir)
      val eagerPinMs = (System.nanoTime() - t0) / 1e6
      val lazySrv = graft.query.LocalServeLazy.fromStore(spark, dir)
      // cold: the first queries pin their probed cells on demand
      val coldMs = (0 until 8).map { i =>
        val t = System.nanoTime()
        lazySrv.query(q(i), 10, 4)
        (System.nanoTime() - t) / 1e6
      }
      // warm: repeat the same queries — zero cold loads expected
      val loadsAfterCold = lazySrv.coldLoads
      val warmMs = (0 until 8).flatMap { i =>
        (0 until 25).map { _ =>
          val t = System.nanoTime()
          lazySrv.query(q(i), 10, 4)
          (System.nanoTime() - t) / 1e6
        }
      }.sorted
      require(lazySrv.coldLoads == loadsAfterCold, "warm queries re-pinned")
      // parity spot-check vs the eager pin
      (0 until 8).foreach { i =>
        require(lazySrv.query(q(i), 10, 4).toSeq ==
          eager.query(q(i), 10, 4).toSeq, s"lazy/eager mismatch at $i")
      }
      println(f"  eager pin (all 32 cells up front): $eagerPinMs%.0f ms")
      println(f"  cold first-probe queries: ${coldMs.map(m => f"$m%.0f").mkString(", ")} ms " +
        f"(pinned ${loadsAfterCold} cells, ${lazySrv.cells.size} resident)")
      println(f"  warm p50 ${warmMs(warmMs.length / 2)}%.2f ms, " +
        f"p99 ${warmMs((warmMs.length * 99) / 100)}%.2f ms over ${warmMs.length} queries")
    }

    spark.stop()
  }
}
