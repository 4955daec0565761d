package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Drift.psiBuckets: zero drift on identical snapshots, sign structure
  * on a known shift, bucket clamping, and the smoothing convention. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(vs: Seq[Double]) = vs.map(Tuple1(_)).toDF("v")

  test("identical snapshots have zero PSI in every bucket") {
    val a = df(Seq(5.0, 15.0, 25.0, 25.0, 95.0))
    val rows = Drift.psiBuckets(a, a, "v", width = 10.0, numBuckets = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 10) // every bucket present, empties included
    assert(rows.forall(_._4 === 0L))
    assert(rows.map(t => t._2).sum === 5L)
  }

  test("a mass shift contributes positively at BOTH ends, zero elsewhere") {
    // (p_new − p_old)·ln(p_new/p_old) has matching factor signs, so every
    // bucket's contribution is ≥ 0 — drift shows up wherever mass moved
    val a = df(Seq.fill(50)(5.0))   // all bucket 0
    val b = df(Seq.fill(50)(95.0))  // all bucket 9
    val m = Drift.psiBuckets(a, b, "v", 10.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m(0L) > 0L) // mass left bucket 0
    assert(m(9L) > 0L) // mass arrived in bucket 9
    assert((1L to 8L).forall(m(_) === 0L)) // untouched buckets: p equal
    // summary row agrees with the bucket sum
    val s = Drift.psi(a, b, "v", 10.0, 10).collect()(0)
    assert(s.getLong(0) === m.values.sum)
    assert((s.getLong(1), s.getLong(2)) === ((50L, 50L)))
  }

  test("embedding-space PSI: zero on identical snapshots, loud on a planted " +
    "cluster shift, one cell per model cell") {
    import org.apache.spark.sql.functions.{array, col, lit, when}
    // two well-separated blobs in 4-d: ids 0..49 near (0,0,0,0),
    // ids 50..99 near (10,10,10,10); deterministic jitter via id
    val pts = spark.range(100).select(col("id"),
      array((0 until 4).map(d =>
        (when(col("id") < 50, lit(0.0f)).otherwise(lit(10.0f)) +
          (col("id") % 7).cast("float") * lit(0.01f))): _*).as("emb"))
    val model = Clustering.fit(pts, "emb", k = 2, seed = 7L,
      trainPointsPerCentroid = 0)
    // identical snapshots: every cell's contribution is exactly zero
    val zero = Drift.embeddingPsiBuckets(pts, pts, "emb", model)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(zero.length === 2)
    assert(zero.forall(_._2 === 0L))
    // planted shift: move 30 of the 50 blob-A points to blob B
    val cur = spark.range(100).select(col("id"),
      array((0 until 4).map(d =>
        (when(col("id") < 20, lit(0.0f)).otherwise(lit(10.0f)) +
          (col("id") % 7).cast("float") * lit(0.01f))): _*).as("emb"))
    val s = Drift.embeddingPsi(pts, cur, "emb", model).collect()(0)
    assert(s.getLong(0) > 100000L) // PSI > 0.1 — a loud, investigate-level shift
    assert((s.getLong(1), s.getLong(2)) === ((100L, 100L)))
    // bucket rows: both cells moved (mass left one, arrived in the other)
    val buckets = Drift.embeddingPsiBuckets(pts, cur, "emb", model)
      .collect().map(r => r.getLong(3))
    assert(buckets.forall(_ > 0L))
  }

  test("out-of-range values clamp into the edge buckets") {
    val a = df(Seq(-100.0, 1e9))
    val rows = Drift.psiBuckets(a, a, "v", 10.0, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(0L) === 1L) // -100 clamped up
    assert(rows(3L) === 1L) // 1e9 clamped down
  }

  test("ksStatistic: identical samples give 0, disjoint give n_a*n_b, " +
      "and a hand case matches") {
    import spark.implicits._
    def longs(xs: Seq[Long]) = xs.toDF("x")
    def ks(a: Seq[Long], b: Seq[Long]) = {
      val r = Drift.ksStatistic(longs(a), longs(b), "x").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    assert(ks(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) === ((0L, 3L, 3L, 1L)))
    // fully separated: at x=3 all of A (4) and none of B → 4·3
    assert(ks(Seq(1L, 2L, 2L, 3L), Seq(10L, 11L, 12L)) ===
      ((12L, 4L, 3L, 3L)))
    // hand case: A={1,2,2,4}, B={2,3}; pooled x: 1,2,3,4
    // cumA=1,3,3,4  cumB=0,1,2,2 → |cumA·2 − cumB·4| = 2,2,2,0 → max 2
    // at the SMALLEST attaining x = 1
    assert(ks(Seq(1L, 2L, 2L, 4L), Seq(2L, 3L)) === ((2L, 4L, 2L, 1L)))
    // nulls are excluded
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("x")
    val r = Drift.ksStatistic(withNull, longs(Seq(1L, 2L)), "x").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 2L, 2L)))
  }

  test("ksStatistic detects a shift PSI's wide buckets miss") {
    import spark.implicits._
    // +1 shift inside one 10-wide bucket: PSI(width 10) sees nothing
    val a = (0 until 100).map(i => (i % 5).toLong + 2L).toDF("x")
    val b = (0 until 100).map(i => (i % 5).toLong + 3L).toDF("x")
    val psi = Drift.psi(a.select($"x".cast("double").as("v")),
        b.select($"x".cast("double").as("v")), "v", 10.0, 4)
      .collect()(0).getLong(0)
    assert(psi === 0L)
    val d = Drift.ksStatistic(a, b, "x").collect()(0).getLong(0)
    assert(d === 2000L) // gap of 20 rows × n_b=100 at x=2
  }

  test("ksFromHistograms: additively merged batch histograms equal " +
      "the one-shot statistic") {
    import spark.implicits._
    val a = Seq(1L, 2L, 2L, 4L, 5L, 5L).toDF("x")
    val b = Seq(2L, 3L, 5L, 9L).toDF("x")
    val oneShot = Drift.ksStatistic(a, b, "x").collect()(0).toSeq
    import org.apache.spark.sql.functions.{count, lit, sum}
    def hist(xs: Seq[Long]) = xs.toDF("x")
      .groupBy("x").agg(count(lit(1)).as("n"))
    // a's histogram arrives as two merged batches
    val aMerged = hist(Seq(1L, 2L, 5L)).unionByName(hist(Seq(2L, 4L, 5L)))
      .groupBy("x").agg(sum("n").as("n"))
    val fromState = Drift.ksFromHistograms(aMerged, hist(Seq(2L, 3L, 5L, 9L)))
      .collect()(0).toSeq
    assert(fromState === oneShot)
  }

  test("chiSquare: zero on identical snapshots, exactly N on complete " +
      "separation, dof counts only informative cells") {
    val a = df(Seq.fill(50)(5.0))   // all bucket 0
    // identical → every cell contributes 0
    assert(Drift.chiSquareBuckets(a, a, "v", 10.0, 10)
      .collect().map(_.getLong(3)).forall(_ === 0L))
    // complete separation of 50 vs 50 → the textbook chi2 = N = 100
    val b = df(Seq.fill(50)(95.0))
    val s = Drift.chiSquare(a, b, "v", 10.0, 10).collect()(0)
    assert(s.getLong(0) === 100L * 1000000L)
    assert(s.getLong(1) === 1L) // 2 nonzero cells → dof 1
    assert((s.getLong(2), s.getLong(3)) === ((50L, 50L)))
    // empty-on-both-sides cells contribute 0 rows of evidence
    val m = Drift.chiSquareBuckets(a, b, "v", 10.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert((1L to 8L).forall(m(_) === 0L))
    assert(m(0L) === 50L * 1000000L && m(9L) === 50L * 1000000L)
  }

  test("chiSquareFromCellCounts is the mergeable-state entry point: " +
      "merged batch histograms equal the one-shot buckets") {
    import org.apache.spark.sql.functions.{count, lit, sum}
    val a = df(Seq(5.0, 15.0, 15.0, 25.0))
    val b = df(Seq(5.0, 5.0, 25.0, 35.0))
    val oneShot = Drift.chiSquareBuckets(a, b, "v", 10.0, 4)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    def hist(vs: Seq[Double]) = df(vs)
      .select(Drift.bucketOf($"v", 10.0, 4).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val aMerged = hist(Seq(5.0, 15.0)).unionByName(hist(Seq(15.0, 25.0)))
      .groupBy("bucket").agg(sum("n").as("n"))
    val fromState = Drift.chiSquareFromCellCounts(
        aMerged, hist(Seq(5.0, 5.0, 25.0, 35.0)), 4)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(fromState === oneShot)
  }
}
