package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Clustering, Outliers, TextAnalysis, TrainingData}

/** Giant-group scale canary for the round-10 sampler twins (the
  * round-10 verdict's weak family): every probe builds n rows over
  * EIGHT groups — each group a corpus-eighth, the exact shape where the
  * window forms put millions of rows into one task's sort — and times
  * the window reference form against its scale twin on identical data.
  * Counts are printed for both legs (parity is gated/spec'd elsewhere;
  * this probe is about the plan class), plus 100M-scale legs for the
  * round-10 span-decontamination newcomers and vocabGrowth.
  *
  * Usage: runMain graft.tools.Round11ScaleProbe
  *          [n=10000000] [filter] [cap=100000]
  */
object Round11ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val filter = if (args.length > 1)
      args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else Seq.empty
    val capArg = if (args.length > 2) args(2).toInt else 100000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit =
      if (filter.isEmpty || filter.exists(f0 => name.contains(f0))) {
        val t0 = System.nanoTime()
        val rows = f
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
      }

    // n rows, 8 giant groups (each n/8 rows — the low-cardinality group
    // key shape), a quantized score domain (10k distinct values/group,
    // inside every hist twin's cardinality contract), a positive weight
    def rows = spark.range(n).repartition(64)
      .select(col("id"),
        concat(lit("src"), pmod(col("id"), lit(8))).as("source"),
        pmod(hash(col("id"), lit(7)), lit(10000)).cast("long").as("score"),
        (pmod(hash(col("id"), lit(11)), lit(999)) + 1).cast("double")
          .as("weight"))

    val cap = capArg // quota ≪ group: the bounded-top-k regime

    timed(s"perGroupCap WINDOW, $n rows / 8 groups, cap=$cap") {
      TrainingData.perGroupCap(rows, "source", "id", cap).count()
    }
    timed(s"perGroupCapTopK twin, $n rows / 8 groups, cap=$cap") {
      TrainingData.perGroupCapTopK(rows, "source", "id", cap).count()
    }

    def quotas = spark.range(8)
      .select(concat(lit("src"), col("id")).as("source"),
        (lit(cap) - col("id") * 1000).cast("int").as("n"))
    timed(s"stratifiedSample WINDOW, $n rows / 8 groups") {
      TrainingData.stratifiedSample(rows, "source", "id", quotas, 7L).count()
    }
    timed(s"stratifiedSampleTopK twin, $n rows / 8 groups") {
      TrainingData.stratifiedSampleTopK(rows, "source", "id", quotas, 7L)
        .count()
    }

    timed(s"weightedSamplePerGroup WINDOW, $n rows / 8 groups, k=$cap") {
      TrainingData.weightedSamplePerGroup(rows, "source", "id", "weight",
        cap).count()
    }
    timed(s"weightedSamplePerGroupTopK twin, $n rows / 8 groups, k=$cap") {
      TrainingData.weightedSamplePerGroupTopK(rows, "source", "id",
        "weight", cap).count()
    }

    // rank sinks aggregate the rank column so the whole projection runs
    timed(s"rankNormalize WINDOW, $n rows / 8 groups") {
      TrainingData.rankNormalize(rows, "source", "score")
        .agg(sum(col("rank_bp"))).collect()(0).getLong(0)
    }
    timed(s"rankNormalizeHist twin, $n rows / 8 groups") {
      TrainingData.rankNormalizeHist(rows, "source", "score")
        .agg(sum(col("rank_bp"))).collect()(0).getLong(0)
    }

    timed(s"winsorize WINDOW, $n rows / 8 groups") {
      Outliers.winsorize(rows, "source", "score", "id")
        .agg(sum(col("clipped")) + sum(col("score")))
        .collect()(0).getLong(0)
    }
    timed(s"winsorizeHist twin, $n rows / 8 groups") {
      Outliers.winsorizeHist(rows, "source", "score")
        .agg(sum(col("clipped")) + sum(col("score")))
        .collect()(0).getLong(0)
    }

    timed(s"madOutliers WINDOW, $n rows / 8 groups") {
      Outliers.madOutliers(rows, "source", "score", "id")
        .agg(sum(col("is_outlier"))).collect()(0).getLong(0)
    }
    timed(s"madOutliersHist twin, $n rows / 8 groups") {
      Outliers.madOutliersHist(rows, "source", "score")
        .agg(sum(col("is_outlier"))).collect()(0).getLong(0)
    }

    // prototype pruning over k=4 clusters — each cluster ~ a corpus
    // quarter (the giant-group regime the hist twin exists for)
    // block guards test the same direction as timed(): the filter term
    // must be a substring of a timed name inside the block
    if (filter.isEmpty || filter.exists(f =>
        s"prototypePrune WINDOW, $n vecs / 4 clusters, drop 10%".contains(f) ||
        s"prototypePruneHist twin, $n vecs / 4 clusters, drop 10%".contains(f))) {
      import graft.functions.FastFunctions.pseudoRandomVec
      val vecs = spark.range(n).repartition(64)
        .select(col("id"), pseudoRandomVec(col("id"), 8, 42L).as("vec"))
        .localCheckpoint()
      val model = Clustering.fit(vecs, "vec", 4, seed = 42L)
      timed(s"prototypePrune WINDOW, $n vecs / 4 clusters, drop 10%") {
        Clustering.prototypePrune(vecs, "id", "vec", model, 10).count()
      }
      timed(s"prototypePruneHist twin, $n vecs / 4 clusters, drop 10%") {
        Clustering.prototypePruneHist(vecs, "id", "vec", model, 10).count()
      }
    }

    // semDeDup decision layer at 10M members over FOUR giant cells:
    // planted pairs (each id in the lower half pairs with id + n/2),
    // 16-dim vectors; probes the farness scoring (broadcast cell sums
    // + zip_with fold), the component closure, and the
    // component-bounded keepBest window. The cell derives from the
    // PAIRED base id (id mod half) so both members of a planted pair
    // share a cell for ANY n — cell = id mod 4 would only hold when
    // half % 4 == 0 and silently violate semDeDup's equal-cell pair
    // precondition otherwise
    if (filter.isEmpty || filter.exists(f =>
        s"semDeDup, $n members / 4 cells, ${n / 2} planted pairs"
          .contains(f))) {
      import graft.functions.FastFunctions.pseudoRandomVec
      val half = n / 2
      val emb = spark.range(n).repartition(64)
        .select(col("id"),
          pmod(pmod(col("id"), lit(half)), lit(4)).as("cell"),
          pseudoRandomVec(pmod(col("id"), lit(half)), 16, 7L).as("vec"))
      val prs = spark.range(half).repartition(64)
        .select(col("id").as("a_id"), (col("id") + half).as("b_id"))
      timed(s"semDeDup, $n members / 4 cells, ${half} planted pairs") {
        graft.pipeline.Dedup.semDeDup(emb, "id", "vec", "cell", prs)
          .agg(sum(col("keep"))).collect()(0).getLong(0)
      }
    }

    // vocabGrowth: the round-10 verdict flagged the exact form's
    // unpartitioned cumulative window (doc-count-sized: one task sorts
    // a row per document); the bucketed twin's window is CURVE-sized
    // (one row per report point). Probe both on identical data.
    def vgDocs = spark.range(n).repartition(64)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 16).map(k =>
          concat(lit("w"), pmod(hash(col("id"), lit(k)), lit(5000000)))): _*)
          .as("text"))
    val vgEvery = math.max(1L, n / 1000).toInt
    // sink sums the curve columns — a bare count() lets Catalyst prune
    // the window and both aggregates out of the plan (measured: 5.5 s
    // for a "100M" exact run that never built a token row)
    timed(s"vocabGrowth EXACT (doc-count-sized window), $n docs") {
      TextAnalysis.vocabGrowth(vgDocs, "doc_id", vgEvery)
        .agg(sum(col("cum_tokens") + col("cum_vocab")))
        .collect()(0).getLong(0)
    }
    timed(s"vocabGrowthBucketed twin (curve-sized window), $n docs") {
      TextAnalysis.vocabGrowthBucketed(vgDocs, "doc_id", vgEvery)
        .agg(sum(col("cum_tokens") + col("cum_vocab")))
        .collect()(0).getLong(0)
    }

    spark.stop()
  }
}
