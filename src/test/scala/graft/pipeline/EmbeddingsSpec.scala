package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EmbeddingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val data = Seq(
    (1L, 0, Seq(1.0f, 2.0f, 3.0f)),
    (2L, 0, Seq(3.0f, 4.0f, 5.0f)),
    (3L, 1, Seq(10.0f, 10.0f, 10.0f)))
    .toDF("vec_id", "label", "embedding")

  test("centroids: per-group mean vector in position order") {
    val r = Embeddings.centroids(data, "label", "embedding")
      .orderBy("label").collect()
      .map(x => (x.getInt(0), x.getSeq[Double](1).toSeq, x.getLong(2)))
    assert(r.toSeq === Seq(
      (0, Seq(2.0, 3.0, 4.0), 2L),
      (1, Seq(10.0, 10.0, 10.0), 1L)))
  }

  test("centroidSumsMilli: integer-exact partial sums") {
    val r = Embeddings.centroidSumsMilli(data, "label", "embedding")
      .orderBy("label", "pos").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq(
      (0, 0L, 4000L, 2L), (0, 1L, 6000L, 2L), (0, 2L, 8000L, 2L),
      (1, 0L, 10000L, 1L), (1, 1L, 10000L, 1L), (1, 2L, 10000L, 1L)))
  }

  test("jacobiEig: known 2x2 and 3x3 spectra, orthonormal vectors") {
    val (ev2, vc2) = Embeddings.jacobiEig(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev2(0) - 3.0) < 1e-12 && math.abs(ev2(1) - 1.0) < 1e-12)
    // eigenvector of λ=3 is ±(1,1)/√2
    assert(math.abs(math.abs(vc2(0)(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(vc2(0)(0) - vc2(0)(1)) < 1e-12)
    val m3 = Array( // diag(5,2,1) rotated is overkill; use arrow matrix
      Array(4.0, 1.0, 0.0), Array(1.0, 3.0, 1.0), Array(0.0, 1.0, 2.0))
    val (ev3, vc3) = Embeddings.jacobiEig(m3)
    assert(math.abs(ev3.sum - 9.0) < 1e-10)           // trace preserved
    assert(ev3(0) >= ev3(1) && ev3(1) >= ev3(2))      // descending
    for (i <- 0 until 3; j <- i until 3) {            // orthonormal rows
      val dot = (0 until 3).map(t => vc3(i)(t) * vc3(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10)
    }
    // A v = λ v for the top pair
    val av = (0 until 3).map(r => (0 until 3).map(t => m3(r)(t) * vc3(0)(t)).sum)
    for (r <- 0 until 3) assert(math.abs(av(r) - ev3(0) * vc3(0)(r)) < 1e-10)
  }

  test("pcaFit recovers the dominant direction of correlated data") {
    // points t·(0.6, 0.8, 0) + small deterministic noise
    val pts = (0 until 400).map { i =>
      val t = (i % 40) - 19.5
      val n1 = math.sin(i * 0.7) * 0.05
      val n2 = math.cos(i * 1.3) * 0.05
      (i.toLong, Seq((0.6 * t + n1).toFloat, (0.8 * t + n2).toFloat,
        (n1 - n2).toFloat))
    }.toDF("vec_id", "embedding")
    val m = Embeddings.pcaFit(pts, "embedding", k = 2)
    assert(m.dim === 3 && m.n === 400L)
    // top component aligns with ±(0.6, 0.8, 0)
    val c0 = m.components(0)
    val cosTop = math.abs(c0(0) * 0.6 + c0(1) * 0.8)
    assert(cosTop > 0.999, s"top component ${c0.toSeq}")
    assert(m.eigenvalues(0) > 100 * m.eigenvalues(1)) // dominant
    assert(math.abs(m.eigenvalues.sum - m.trace) < 1e-9 * m.trace)
  }

  test("pcaProject: centered, variance per component = eigenvalue") {
    val pts = (0 until 300).map { i =>
      (i.toLong, Seq((math.sin(i * 0.31) * 3).toFloat,
        (math.cos(i * 0.17) * 2).toFloat, (math.sin(i * 0.53)).toFloat))
    }.toDF("vec_id", "embedding")
    val m = Embeddings.pcaFit(pts, "embedding", k = 3)
    val proj = Embeddings.pcaProject(pts, "vec_id", "embedding", m)
      .collect().map(_.getSeq[Double](1).toArray)
    for (c <- 0 until 3) {
      val xs = proj.map(_(c))
      val mean = xs.sum / xs.length
      assert(math.abs(mean) < 1e-9, s"component $c mean $mean")
      val varp = xs.map(x => x * x).sum / xs.length - mean * mean
      assert(math.abs(varp - m.eigenvalues(c)) <
        1e-9 + 1e-9 * m.eigenvalues(c), s"component $c var $varp")
    }
  }

  test("pcaWhiten: identity covariance on the projected subspace") {
    val pts = (0 until 500).map { i =>
      (i.toLong, Seq((math.sin(i * 0.31) * 3 + math.cos(i * 0.11)).toFloat,
        (math.cos(i * 0.17) * 2).toFloat,
        (math.sin(i * 0.53) + math.sin(i * 0.19)).toFloat))
    }.toDF("vec_id", "embedding")
    val m = Embeddings.pcaFit(pts, "embedding", k = 3)
    val w = Embeddings.pcaWhiten(pts, "vec_id", "embedding", m)
      .collect().map(_.getSeq[Double](1).toArray)
    for (i <- 0 until 3; j <- i until 3) {
      val cov = w.map(p => p(i) * p(j)).sum / w.length
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov - want) < 1e-6, s"cov($i,$j) = $cov")
    }
  }

  test("l2Normalized: unit norms, direction preserved, zero passthrough") {
    val df = Seq(
      (1L, Seq(3f, 4f, 0f)),
      (2L, Seq(0f, 0f, 0f)), // zero vector must pass through, not NaN
      (3L, Seq(-2f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Embeddings.l2Normalized(df, "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(1L).zip(Seq(0.6f, 0.8f, 0f))
      .forall { case (a, b) => math.abs(a - b) < 1e-6 })
    assert(got(2L) === Seq(0f, 0f, 0f))
    assert(got(3L) === Seq(-1f, 0f, 0f))
    // norms of non-zero rows are 1 within f32 rounding
    got.filterKeys(_ != 2L).values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6)
    }
  }

  test("matryoshkaRecall: prefix ranking diverges, full dim is exact") {
    // query at the origin; a's PREFIX is closest (d=2 winner) but its
    // tail is huge (d=4 winner is b) -> recall 0% at d=2, 100% at d=4
    val emb = Seq(
      (1L, Seq(0f, 0f, 9f, 9f)),   // a
      (2L, Seq(1f, 1f, 0f, 0f))).toDF("vec_id", "embedding") // b
    val qs = Seq((100L, Seq(0f, 0f, 0f, 0f))).toDF("qid", "qvec")
    val got = Embeddings.matryoshkaRecall(emb, "vec_id", "embedding",
        qs, "qid", "qvec", dims = Seq(2, 4), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((2L, 1L, 0L, 0L), (4L, 1L, 1L, 10000L)))
  }

  test("filtered k-NN: the attribute predicate reaches the parquet scan") {
    // write a small parquet table, filter + top-k, inspect the scan
    val dir = java.nio.file.Files.createTempDirectory("knnf").toString
    try {
      data.write.mode("overwrite").parquet(dir)
      val emb = spark.read.parquet(dir)
      val plan = graft.query.ExactKnn
        .rankedIds(emb.where(col("label") === 1), "embedding", "vec_id",
          Array(1f, 1f, 1f), 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,1)]"),
        s"filter not pushed:\n$plan")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
