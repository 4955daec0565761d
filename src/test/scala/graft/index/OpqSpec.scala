package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.query.{AnnQuery, ExactKnn}

/** OPQ (Ge et al. CVPR 2013, non-parametric) — rotation training math,
  * parity with plain IVF+PQ at the degenerate settings, and the
  * build/query/store invariants of the new index family. */
class OpqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val config =
    IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 16, maxIter = 20)

  // the IvfPqSpec blob layout: 4 well-separated macro blobs × 10 seeds ×
  // 5 near-clones — same planted-neighbor structure, so recall is testable
  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    val blobs = Seq.tabulate(4)(_ => Array.fill(dim)(rnd.nextDouble() * 20 - 10))
    for {
      (blob, b) <- blobs.zipWithIndex
      seed <- 0 until 10
      seedVec = blob.map(v => v + rnd.nextGaussian() * 0.8)
      clone <- 0 until 5
    } yield (((b * 10 + seed) * 5 + clone).toLong,
      seedVec.map(v => (v + rnd.nextGaussian() * 0.02).toFloat).toSeq)
  }
  private lazy val df = data.toDF("id", "vec")
  private lazy val (model, encoded) =
    OpqBuilder.fit(df, "id", "vec", dim, config, opqIters = 4)

  /** A deterministic non-trivial orthonormal matrix (product of Givens
    * rotations over a seeded angle sequence). */
  private def randomRotation(d: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val r = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until 4 * d) {
      val p = rnd.nextInt(d)
      val q = (p + 1 + rnd.nextInt(d - 1)) % d
      val a = rnd.nextDouble() * math.Pi
      val (c, s) = (math.cos(a), math.sin(a))
      for (t <- 0 until d) {
        val (rp, rq) = (r(p)(t), r(q)(t))
        r(p)(t) = c * rp - s * rq
        r(q)(t) = s * rp + c * rq
      }
    }
    r
  }

  test("procrustes recovers a known rotation exactly") {
    val d = 8
    val r0 = randomRotation(d, 11L)
    val rnd = new scala.util.Random(3)
    val xs = Array.fill(200)(Array.fill(d)(rnd.nextGaussian()))
    // y = R0·x; M = Σ x·yᵀ ⇒ argmin_R Σ‖R·x − y‖² must be R0
    val m = Array.ofDim[Double](d, d)
    xs.foreach { x =>
      val y = OpqBuilder.rotateVec(r0, x)
      for (a <- 0 until d; b <- 0 until d) m(a)(b) += x(a) * y(b)
    }
    val r = OpqBuilder.procrustes(m)
    for (a <- 0 until d; b <- 0 until d)
      assert(math.abs(r(a)(b) - r0(a)(b)) < 1e-8, s"entry ($a,$b)")
  }

  test("training objective is monotone non-increasing; rotation orthonormal") {
    // anisotropic Gaussian whose principal axes are deliberately NOT
    // axis-aligned (a fixed rotation of a diagonal-variance latent):
    // contiguous-slice PQ wastes code budget on the correlation, which is
    // exactly what the learned rotation removes
    val d = 16
    val rot0 = randomRotation(d, 23L)
    val rnd = new scala.util.Random(5)
    val scales = Array.tabulate(d)(i => math.pow(0.72, i) * 10.0)
    val latent = Array.fill(3000)(
      Array.tabulate(d)(i => (rnd.nextGaussian() * scales(i))))
    val pts = latent.map(z => OpqBuilder.rotateVec(rot0, z).map(_.toFloat))
    val cfg = IvfPqConfig(numPartitions = 1, numDivisions = 4, numCodes = 16,
      maxIter = 25)
    val (rot, _, objs) =
      OpqBuilder.trainRotation(pts, d, cfg, opqIters = 6, _ => ())
    objs.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a * (1 + 1e-9), s"objective rose: $a -> $b")
    }
    // on this corpus the rotation must buy a real improvement over the
    // plain-PQ first sweep, not just not-lose
    assert(objs.last < objs.head * 0.98,
      s"no OPQ gain: first=${objs.head} last=${objs.last}")
    val m = OpqModel(IvfPqModel(cfg, d,
      Array(Array.fill(d)(0.0)), Array(Array(Array(0.0)))), rot, objs)
    assert(m.orthonormalityError < 1e-9)
  }

  test("opqIters=1 degenerates to plain IVF+PQ: identical codes") {
    val (_, plainEnc) = IvfPqBuilder.fit(df, "id", "vec", dim, config)
    val (m1, opqEnc) = OpqBuilder.fit(df, "id", "vec", dim, config, opqIters = 1)
    // identity rotation by construction
    assert(m1.rotation.zipWithIndex.forall { case (row, i) =>
      row.zipWithIndex.forall { case (v, j) =>
        v == (if (i == j) 1.0 else 0.0) }
    })
    val plain = plainEnc.select("id", "partition", "codes").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getSeq[Int](2)))).toMap
    val opq = opqEnc.select("id", "partition", "codes").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getSeq[Int](2)))).toMap
    assert(opq === plain)
  }

  test("encoded rotated residual reconstructs the original: Rᵀ·res + centroid") {
    val byId = data.toMap
    val rt = model.rotation.transpose
    encoded.select("id", "partition", "residual").collect().foreach { r =>
      val orig = byId(r.getLong(0))
      val c = model.ivf.partitionCentroids(r.getInt(1))
      val res = r.getSeq[Float](2).map(_.toDouble).toArray
      val back = OpqBuilder.rotateVec(rt, res)
      orig.indices.foreach { i =>
        assert(math.abs(back(i) + c(i) - orig(i)) < 1e-3,
          s"id ${r.getLong(0)} dim $i")
      }
    }
  }

  test("opq query: recall vs exact, ascending distances, probed cells only") {
    val q = data.head._2.map(_.toDouble).toArray
    val hits = OpqBuilder.topK(encoded, model, q, k = 5, nprobe = 4)
    val approx = hits.collect().map(_.getLong(0)).toSeq
    val exact = ExactKnn.topK(df, "vec", "id", data.head._2, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(AnnQuery.recallAtK(approx, exact) >= 0.8,
      s"recall too low: approx=$approx exact=$exact")
    val probes = AnnQuery.selectPartitions(model.ivf, q, 2).map(_._1).toSet
    val rows = OpqBuilder.topK(encoded, model, q, k = 20, nprobe = 2).collect()
    val dists = rows.map(_.getAs[Double]("sq_dist")).toSeq
    assert(dists == dists.sorted)
    assert(rows.forall(r => probes.contains(r.getAs[Int]("partition"))))
  }

  test("opq query events: rotate-probes slots between select-partitions " +
      "and the shared scan assembly") {
    val q = data.head._2.map(_.toDouble).toArray
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    val hits = OpqBuilder.topK(encoded, model, q, k = 5, nprobe = 2,
      log = events += _)
    assert(hits.count() === 5)
    assert(events.map(_.split(" ").head).toSeq === Seq("select-partitions",
      "rotate-probes", "build-adc-tables", "scan", "merge"))
  }

  test("batchTopKDirect: per-query parity with topK, with and without pruning") {
    val qids = Seq(0L, 7L, 55L)
    val queries = qids.map(i => i -> data(i.toInt)._2).toDF("qid", "qvec")
    for (prune <- Seq(false, true)) {
      val batch = OpqBuilder.batchTopKDirect(encoded, model, queries,
        "qid", "qvec", k = 5, nprobe = 2, pruneCells = prune)
        .collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getLong(3))
          .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
      qids.foreach { qid =>
        val q = data(qid.toInt)._2.map(_.toDouble).toArray
        val single = OpqBuilder.topK(encoded, model, q, k = 5, nprobe = 2)
          .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
        assert(batch(qid).map(_._1) === single.map(_._1),
          s"ids diverge for query $qid (prune=$prune)")
        // distances agree up to the f32 query-rotation rounding
        batch(qid).zip(single).foreach { case ((_, bd), (_, sd)) =>
          assert(math.abs(bd - sd) <= 1e-3 * math.max(1.0, sd),
            s"distance diverged for query $qid: $bd vs $sd")
        }
      }
    }
  }

  test("topKRerank: exact distances, recall never below raw ADC") {
    val qv = data(3)._2
    val q = qv.map(_.toDouble).toArray
    val exact = ExactKnn.topK(df, "vec", "id", qv, 5)
      .collect().map(_.getLong(0)).toSet
    val rr = OpqBuilder.topKRerank(encoded, df, "vec", "id", model, q,
      k = 5, nprobe = 4).collect()
    assert(rr.length === 5)
    val dists = rr.map(_.getAs[Double]("sq_dist")).toSeq
    assert(dists == dists.sorted)
    val adcIds = OpqBuilder.topK(encoded, model, q, k = 5, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(rr.map(_.getLong(0)).toSet.intersect(exact).size
      >= adcIds.intersect(exact).size)
  }

  test("save/load round-trip answers bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("opq_store").toString
    try {
      OpqBuilder.save(model, encoded, dir)
      val (loaded, codes) = OpqBuilder.load(spark, dir)
      assert(loaded.orthonormalityError < 1e-9)
      val q = data(7)._2.map(_.toDouble).toArray
      val mem = OpqBuilder.topK(encoded, model, q, k = 10, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      val st = OpqBuilder.topK(codes, loaded, q, k = 10, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      assert(st === mem)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
