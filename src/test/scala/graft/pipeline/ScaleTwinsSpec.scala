package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Parity gates for the seven scale-safe twins of the giant-group-window
  * samplers (the round-10 weak family): each twin must reproduce its
  * exact form's output at spec cardinality, with the divergence contract
  * pinned where one exists.
  *
  *  - Bounded-top-k twins (perGroupCapTopK, weightedSamplePerGroupTopK,
  *    stratifiedSampleTopK): the per-group cut is a map-side-combinable
  *    aggregate, shuffle ≤ k·|groups|. Divergence contract: the md5 race
  *    key is truncated to its first 52 bits (13 hex chars) — a tie there
  *    breaks by id instead of the 14th hex char, ~n²/2⁵³ odds per group
  *    (the weighted twin's race key is already a double: bit-identical,
  *    no truncation).
  *  - Histogram twins (rankNormalizeHist, clipBoundsHist/winsorizeHist,
  *    madOutliersHist, prototypePruneHist): EXACTLY equal by
  *    construction — order statistics and min-ranks are value statistics
  *    the window's id tie-break cannot change, and prototypePruneHist
  *    resolves its one undecidable bucket by the same (d2, id) rank.
  *    Their contract is cardinality, not value: ≤ maxDistinct distinct
  *    values/buckets per group, asserted loudly in-plan.
  */
class ScaleTwinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 groups of very different sizes (1 / 7 / 60 / 300), value ties on
  // purpose (v = i/3 folds triples), ids interleaved across groups
  private lazy val docs = {
    val rows = Seq(("s1", 1)) ++
      (0 until 7).map(i => ("s2", 10 + i)) ++
      (0 until 60).map(i => ("s3", 100 + i)) ++
      (0 until 300).map(i => ("s4", 1000 + i))
    rows.map { case (g, id) => (id.toLong, g, (id / 3).toDouble) }
      .toDF("id", "grp", "v").repartition(7)
  }

  test("perGroupCapTopK == perGroupCap (per-group id sets)") {
    for (cap <- Seq(1, 5, 100)) {
      val exact = TrainingData.perGroupCap(docs, "grp", "id", cap)
        .select("grp", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val twin = TrainingData.perGroupCapTopK(docs, "grp", "id", cap)
        .select("grp", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(twin === exact, s"cap=$cap")
    }
    // all columns survive the semi-join
    assert(TrainingData.perGroupCapTopK(docs, "grp", "id", 3)
      .columns.toSeq === docs.columns.toSeq)
  }

  test("weightedSamplePerGroupTopK == weightedSamplePerGroup " +
      "(bit-identical race keys)") {
    val weighted = docs.withColumn("w", col("id") % 17 + 1)
    for (k <- Seq(1, 4, 50)) {
      val exact = TrainingData.weightedSamplePerGroup(
        weighted, "grp", "id", "w", k).select("grp", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val twin = TrainingData.weightedSamplePerGroupTopK(
        weighted, "grp", "id", "w", k).select("grp", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(twin === exact, s"k=$k")
    }
  }

  test("weightedSamplePerGroupTopK rejects non-positive weights loudly") {
    val bad = docs.withColumn("w", col("id") % 17) // some zeros
    val e = intercept[Exception] {
      TrainingData.weightedSamplePerGroupTopK(bad, "grp", "id", "w", 3)
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("stratifiedSampleTopK == stratifiedSample (variable quotas, " +
      "missing groups excluded, quota > group size)") {
    // s1 has no quota (excluded); s2's quota exceeds its size (7 rows,
    // quota 50 -> all 7); s3/s4 get small quotas
    val quotas = Seq(("s2", 50), ("s3", 11), ("s4", 2)).toDF("grp", "n")
    val exact = TrainingData.stratifiedSample(docs, "grp", "id", quotas, 9L)
      .select("grp", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val twin = TrainingData.stratifiedSampleTopK(docs, "grp", "id", quotas, 9L)
      .select("grp", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(twin === exact)
    assert(twin.count(_._1 == "s2") === 7)
    assert(twin.count(_._1 == "s3") === 11)
    assert(!twin.exists(_._1 == "s1"))
    // empty / zero quotas -> empty result, not a crash
    assert(TrainingData.stratifiedSampleTopK(docs, "grp", "id",
      Seq.empty[(String, Int)].toDF("grp", "n"), 9L).count() === 0L)
    assert(TrainingData.stratifiedSampleTopK(docs, "grp", "id",
      Seq(("s3", 0)).toDF("grp", "n"), 9L).count() === 0L)
  }

  test("rankNormalizeHist == rankNormalize (ties share the min rank; " +
      "singleton group -> 5000)") {
    val exact = TrainingData.rankNormalize(docs, "grp", "v")
      .select("id", "rank_bp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twin = TrainingData.rankNormalizeHist(docs, "grp", "v")
      .select("id", "rank_bp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twin === exact)
    assert(twin(1L) === 5000L) // s1 is a singleton
    // every row survives the histogram join-back
    assert(twin.size === docs.count())
  }

  test("rankNormalizeHist: cardinality contract fails loudly") {
    val e = intercept[Exception] {
      TrainingData.rankNormalizeHist(docs, "grp", "v", maxDistinct = 3)
        .collect()
    }
    assert(e.getMessage.contains("quantize") ||
      (e.getCause != null && e.getCause.getMessage.contains("quantize")))
  }

  test("clipBoundsHist == clipBounds and winsorizeHist == winsorize") {
    val exactB = Outliers.clipBounds(docs, "grp", "v", "id", 1, 20, 19, 20)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toSet
    val twinB = Outliers.clipBoundsHist(docs, "grp", "v", 1, 20, 19, 20)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(twinB === exactB)
    val exactW = Outliers.winsorize(docs, "grp", "v", "id")
      .select("id", "v", "clipped").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val twinW = Outliers.winsorizeHist(docs, "grp", "v")
      .select("id", "v", "clipped").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(twinW === exactW)
  }

  test("madOutliersHist == madOutliers (wild rows flagged identically)") {
    val wild = docs.union(Seq((9901L, "s3", 1e6), (9902L, "s4", -1e6))
      .toDF("id", "grp", "v"))
    val exact = Outliers.madOutliers(wild, "grp", "v", "id")
      .select("id", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twin = Outliers.madOutliersHist(wild, "grp", "v")
      .select("id", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twin === exact)
    assert(twin(9901L) === 1L && twin(9902L) === 1L)
  }

  // 3 well-separated blobs with DUPLICATE vectors (d2 ties the boundary
  // must not split incorrectly) — the prototypePrune fixture shape
  private lazy val blobs = {
    val rnd = new scala.util.Random(13)
    val centers = Seq(Array(0f, 0f, 0f, 0f), Array(10f, 10f, 10f, 10f),
      Array(-10f, 10f, -10f, 10f))
    val sizes = Seq(50, 25, 12)
    val rows = for {
      ((c, s), b) <- centers.zip(sizes).zipWithIndex
      i <- 0 until s
    } yield {
      // every third point duplicates the previous one -> exact d2 ties
      val v = if (i % 3 == 2) c.map(x => x + ((i - 1) % 7) * 0.1f)
              else c.map(x => x + (i % 7) * 0.1f)
      (b * 1000L + i, v)
    }
    rows.toDF("id", "vec").repartition(5)
  }

  test("prototypePruneHist == prototypePrune (duplicate-d2 ties, " +
      "coarse and fine quantization, 0/100 edges)") {
    val model = Clustering.fit(blobs, "vec", k = 3, seed = 11,
      trainPointsPerCentroid = 0)
    for (pct <- Seq(0, 25, 60, 100); scale <- Seq(1e4, 2.0)) {
      val exact = Clustering.prototypePrune(blobs, "id", "vec", model, pct)
        .select("id").as[Long].collect().toSet
      val twin = Clustering.prototypePruneHist(blobs, "id", "vec", model,
        pct, quantScale = scale)
        .select("id").as[Long].collect().toSet
      assert(twin === exact, s"pct=$pct scale=$scale")
    }
    // output shape matches the exact form: df columns + (cluster, d2)
    val cols = Clustering.prototypePruneHist(blobs, "id", "vec", model, 25)
      .columns.toSet
    assert(cols === Set("id", "vec", "cluster", "d2"))
  }
}
