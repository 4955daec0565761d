package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** Driver-local k-means invariants — no Spark session needed. */
class LocalKMeansSpec extends AnyFunSuite {

  private def blobData(k: Int, perBlob: Int, dim: Int,
                       spread: Double): Array[Array[Float]] = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(k)(Array.fill(dim)(rnd.nextDouble() * 100 - 50))
    centers.flatMap(c => Array.fill(perBlob)(
      c.map(v => (v + rnd.nextGaussian() * spread).toFloat)))
  }

  test("well-separated blobs are recovered (one centroid per blob)") {
    val data = blobData(k = 5, perBlob = 40, dim = 8, spread = 0.5)
    val r = LocalKMeans.fit(data, k = 5, maxIter = 50, tol = 1e-6, seed = 1L)
    assert(r.centroids.length === 5)
    // every point's nearest centroid distance is tiny vs blob separation
    val res = LocalKMeans.assignResiduals(data, r.centroids)
    val maxNorm = res.map(v => math.sqrt(v.map(x => x.toDouble * x).sum)).max
    assert(maxNorm < 5.0, s"max residual norm $maxNorm")
    // tol stop fired well before the iteration cap
    assert(r.iters < 50)
  }

  test("n < k fails loudly (reference kmeans.rs errors on this config)") {
    val data = blobData(k = 2, perBlob = 3, dim = 4, spread = 0.1) // n = 6
    for (init <- Seq("kmeans++", "random")) {
      val e = intercept[IllegalArgumentException] {
        LocalKMeans.fit(data, k = 10, maxIter = 5, tol = 1e-9,
          seed = 2L, init = init)
      }
      assert(e.getMessage.contains("n=6 < k=10"), init)
    }
  }

  test("k == n is the exact-copy shortcut: centroids are the points") {
    val data = blobData(k = 2, perBlob = 3, dim = 4, spread = 0.1) // n = 6
    val r = LocalKMeans.fit(data, k = 6, maxIter = 5, tol = 1e-9, seed = 2L)
    assert(r.iters === 0)
    assert(r.centroids.map(_.toSeq).toSeq ===
      data.map(_.map(_.toDouble).toSeq).toSeq)
  }

  test("index builds surface the offending P in the n >= k message") {
    import graft.TestSpark.spark
    import spark.implicits._
    val vecs = (0 until 4).map(i => (i.toLong, Array.fill(8)(i.toFloat)))
      .toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      graft.index.IvfPqBuilder.fit(vecs, "id", "vec", dim = 8,
        graft.index.IvfPqConfig(numPartitions = 16, numDivisions = 2,
          numCodes = 4))
    }
    assert(e.getMessage.contains("P=16"))
  }

  test("deterministic for a fixed (data, seed); seeds differ") {
    val data = blobData(k = 3, perBlob = 30, dim = 6, spread = 2.0)
    val a = LocalKMeans.fit(data, 3, 10, 1e-6, seed = 7L)
    val b = LocalKMeans.fit(data, 3, 10, 1e-6, seed = 7L)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
    assert(a.iters === b.iters)
  }

  test("assignResiduals matches a naive single-threaded recompute") {
    val data = blobData(k = 3, perBlob = 20, dim = 5, spread = 3.0)
    val r = LocalKMeans.fit(data, 3, 10, 1e-6, seed = 3L)
    val fast = LocalKMeans.assignResiduals(data, r.centroids)
    data.zip(fast).foreach { case (p, res) =>
      // naive argmin in full precision
      val best = r.centroids.minBy(c =>
        c.zip(p).map { case (cv, pv) => val d = pv.toDouble - cv; d * d }.sum)
      val expected = p.zip(best).map { case (pv, cv) => (pv.toDouble - cv).toFloat }
      assert(res.toSeq === expected.toSeq)
    }
  }

  test("random init draws distinct points when possible") {
    val data = blobData(k = 4, perBlob = 10, dim = 3, spread = 0.01)
    val r = LocalKMeans.fit(data, k = 8, maxIter = 1, tol = 1e-9,
      seed = 5L, init = "random")
    assert(r.centroids.length === 8)
  }

  test("fitBisecting divides a dominant tight blob's mass (the guarantee " +
      "a flat fit lacks) and is deterministic") {
    // one tight 400-point blob + 3 far 20-point blobs — the partial-
    // rebalance shape; flat k-means can park one center on the big blob
    val rnd = new scala.util.Random(3)
    val big = Array.fill(400)(Array.tabulate(8)(d =>
      (50f + rnd.nextGaussian().toFloat)))
    val small = (1 to 3).flatMap(b => Array.fill(20)(Array.tabulate(8)(d =>
      (-40f * b + rnd.nextGaussian().toFloat)))).toArray
    val data = big ++ small
    val r = LocalKMeans.fitBisecting(data, k = 4, maxIter = 20,
      tol = 1e-6, seed = 11L)
    assert(r.centroids.length === 4)
    // assign every point to its nearest centroid; no cell may hold more
    // than ~60% of the blob — the big blob must have been SPLIT
    val counts = new Array[Int](4)
    data.foreach { v =>
      var best = 0; var bd = Double.MaxValue
      for (c <- 0 until 4) {
        var s = 0.0
        for (t <- v.indices) {
          val d = v(t) - r.centroids(c)(t); s += d * d
        }
        if (s < bd) { bd = s; best = c }
      }
      counts(best) += 1
    }
    assert(counts.max <= 260,
      s"dominant blob not split: cell sizes ${counts.toSeq}")
    assert(counts.forall(_ > 0))
    val r2 = LocalKMeans.fitBisecting(data, k = 4, maxIter = 20,
      tol = 1e-6, seed = 11L)
    assert(r.centroids.map(_.toSeq).toSeq === r2.centroids.map(_.toSeq).toSeq)
  }

  test("fitBisecting freezes an unsplittable heaviest cluster and keeps " +
      "splitting the rest") {
    // 100 IDENTICAL points (heaviest, cannot split) + two far distinct
    // groups — the fit must still separate B and C after freezing A
    val a = Array.fill(100)(Array.fill(4)(0f))
    val b = Array.fill(10)(Array.tabulate(4)(d => 50f + d))
    val c = Array.fill(10)(Array.tabulate(4)(d => -50f - d))
    val r = LocalKMeans.fitBisecting(a ++ b ++ c, k = 3, maxIter = 10,
      tol = 1e-9, seed = 2L)
    assert(r.centroids.length === 3)
    val cents = r.centroids.map(_.toSeq).toSet
    assert(cents.contains(Seq(0.0, 0.0, 0.0, 0.0)), "A's centroid missing")
    assert(cents.exists(_.head > 40), "B never got its own centroid")
    assert(cents.exists(_.head < -40), "C never got its own centroid")
  }

  test("fitBisecting pads degenerate all-identical data by repetition") {
    val data = Array.fill(6)(Array.fill(4)(1.5f))
    val r = LocalKMeans.fitBisecting(data, k = 3, maxIter = 5,
      tol = 1e-9, seed = 1L)
    assert(r.centroids.length === 3)
    assert(r.centroids.forall(_.toSeq === Seq(1.5, 1.5, 1.5, 1.5)))
  }

  test("overlapIndexed: index-ordered results identical to a sequential " +
      "loop; empty/single inputs; body failures rethrow") {
    val seq = (0 until 13).map(i => i * i)
    for (w <- Seq(1, 2, 4, 8)) {
      assert(LocalKMeans.overlapIndexed(13, w)(i => i * i) === seq,
        s"overlap=$w")
    }
    assert(LocalKMeans.overlapIndexed(0)(identity) === Vector.empty)
    assert(LocalKMeans.overlapIndexed(1)(_ => 7) === IndexedSeq(7))
    val ex = intercept[IllegalStateException] {
      LocalKMeans.overlapIndexed(8) { i =>
        if (i == 3) throw new IllegalStateException("fit 3 blew up") else i
      }
    }
    assert(ex.getMessage === "fit 3 blew up")
    intercept[IllegalArgumentException] {
      LocalKMeans.overlapIndexed(4, overlap = 0)(identity)
    }
  }

  test("overlapped PQ-shape fits are bit-identical to sequential fits") {
    val rnd = new scala.util.Random(3)
    val data = Array.fill(2048)(Array.fill(8)(rnd.nextFloat()))
    def one(dI: Int) =
      LocalKMeans.fit(data, 16, maxIter = 10, tol = 1e-6, seed = 42L + dI,
        init = "random")
    val sequential = (0 until 6).map(one)
    val overlapped = LocalKMeans.overlapIndexed(6)(one)
    (0 until 6).foreach { dI =>
      assert(sequential(dI).iters === overlapped(dI).iters)
      sequential(dI).centroids.indices.foreach { ci =>
        assert(java.util.Arrays.equals(sequential(dI).centroids(ci),
          overlapped(dI).centroids(ci)), s"fit $dI centroid $ci differs")
      }
    }
  }
}
