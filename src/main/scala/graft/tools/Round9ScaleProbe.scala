package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.functions.FastFunctions.pseudoRandomVec
import graft.operators.Skyline
import graft.pipeline.{Privacy, TrainingData}

/** Scale canary for the round-9 additions: the histogram-boundary
  * bucketing paths (the swap for the two exact-ntile weak flags), the
  * d-dimensional skyline, bucketed-EMD t-closeness, and the
  * cell-targeted partial rebalance vs its full blue/green twin — all
  * over deterministic in-plan synthetics. Recorded in BENCH_NOTES.md;
  * rerun ad hoc, not part of the per-round bench.
  *
  * Usage: runMain graft.tools.Round9ScaleProbe [n=100000000] [filter]
  */
object Round9ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000000L
    val filter = if (args.length > 1)
      args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
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
    import spark.implicits._

    def timed(name: String)(f: => Long): Unit =
      if (filter.isEmpty || filter.exists(name.contains)) {
        val t0 = System.nanoTime()
        val rows = f
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
      }

    // heavy-tie score column (1000 distinct values over n rows): the
    // histogram the bucketing aggregates is domain-sized by construction
    timed(s"curriculum sampling (histogram-boundary) over $n scored rows") {
      val scored = spark.range(n).repartition(64)
        .select(col("id").as("doc_id"),
          pmod(hash(col("id")), lit(1000)).cast("long").as("score"))
      TrainingData.curriculumSampleApprox(scored, "score", "doc_id",
        Seq(32, 96, 160, 255)).count()
    }

    // the qualityBuckets shape that killed the exact path: ONE head
    // language carries 90% of the corpus — the per-language window must
    // still run over the score histogram, never the corpus rows
    timed(s"grouped bucketing, 90%%-head language, $n rows") {
      val scored = spark.range(n).repartition(64)
        .select(col("id").as("doc_id"),
          when(pmod(col("id"), lit(10)) < 9, lit("en"))
            .otherwise(concat(lit("l"), pmod(col("id"), lit(7))))
            .as("lang"),
          pmod(hash(col("id"), lit(3)), lit(100000)).cast("long")
            .as("score"))
      TrainingData.equalFreqBucket(scored, "score", Seq("lang"),
        k = 3, descending = true).count()
    }

    timed(s"3-D skyline over ${n / 10} rows") {
      val pts = spark.range(n / 10).repartition(64)
        .select(col("id"),
          pmod(hash(col("id"), lit(1)), lit(100000)).cast("long").as("x"),
          pmod(hash(col("id"), lit(2)), lit(100000)).cast("long").as("y"),
          pmod(hash(col("id"), lit(3)), lit(100000)).cast("long").as("z"))
      Skyline.frontierND(pts, Seq("x", "y", "z")).count()
    }

    timed(s"bucketed-EMD t-closeness over $n rows") {
      val rows = spark.range(n).repartition(64)
        .select(pmod(col("id"), lit(500)).cast("long").as("grp"),
          // group-dependent drift so some groups genuinely violate
          (pmod(hash(col("id")), lit(100000)) +
            when(pmod(col("id"), lit(500)) < 25, lit(40000))
              .otherwise(lit(0))).cast("long").as("income"))
      Privacy.tClosenessBuckets(rows, Seq("grp"), "income",
        tX1e6 = 100000L, bucketWidth = 5000L).count()
    }

    // maintenance economics: partial rebalance of a drifted 1M x 128
    // store vs the full blue/green re-fit of the same store
    if (filter.isEmpty || filter.exists("rebalance".contains) ||
        filter.exists(f => "partial rebalance".contains(f))) {
      val dim = 128
      val base = spark.range(1000000L).repartition(64)
        .select(col("id"), pseudoRandomVec(col("id"), dim, 7L).as("vec"))
        .localCheckpoint()
      val (model, enc) = IvfPqBuilder.fit(base, "id", "vec", dim,
        IvfPqConfig(numPartitions = 32, numDivisions = 8, numCodes = 64,
          maxIter = 20))
      val dir = java.nio.file.Files
        .createTempDirectory("r9_rebal").toString
      IvfPqBuilder.save(model, enc, dir)
      // drift: 400k new vectors clustered near one existing cell's
      // centroid — one cell becomes ~5x the mean
      val hotCentroid = model.partitionCentroids(0).map(_.toFloat)
      val drift = spark.range(400000L).repartition(64)
        .select((col("id") + 2000000L).as("id"),
          graft.functions.VectorFunctions.vecAdd(
            typedlit(hotCentroid.toSeq),
            graft.functions.VectorFunctions.vecScale(
              pseudoRandomVec(col("id"), dim, 9L), lit(0.05)))
            .cast("array<float>").as("vec"))
      IvfPqBuilder.appendToStore(model, drift, "id", "vec", dir)
      timed("partial rebalance (drifted 1.4M x 128 store)") {
        val (_, refreshed) =
          IvfPqBuilder.rebalanceStorePartial(spark, dir, 200L)
        println(s"  refreshed cells: ${refreshed.mkString(",")}")
        refreshed.size.toLong
      }
      timed("full blue/green rebalance (same store)") {
        val out = java.nio.file.Files
          .createTempDirectory("r9_rebal_full").toString
        IvfPqBuilder.rebalanceStore(spark, dir, out)
        IvfPqBuilder.load(spark, out)._2.count()
      }
    }
    spark.stop()
  }
}
