package graft.query

import org.apache.spark.sql.functions.{broadcast, col}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.{IvfPqBuilder, IvfPqConfig}

/** Calibrate: the one-pass nprobe-recall curve and its promises —
  * monotone, exactly 1.0 at nprobe = P, deterministic, and the
  * recommended setting's promise HOLDS when the query actually runs
  * (exact-refine end-to-end recall ≥ the curve's value). */
class CalibrateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val config =
    IvfPqConfig(numPartitions = 8, numDivisions = 4, numCodes = 16,
      maxIter = 20)

  // 8 well-separated blobs × 30 points: true neighbors share a blob, so
  // cell recall is a real function of nprobe (blob ≈ cell)
  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    val blobs = Seq.tabulate(8)(_ => Array.fill(dim)(rnd.nextDouble() * 40 - 20))
    for {
      (blob, b) <- blobs.zipWithIndex
      i <- 0 until 30
    } yield ((b * 30 + i).toLong,
      blob.map(v => (v + rnd.nextGaussian() * 1.5).toFloat).toSeq)
  }

  private lazy val df = data.toDF("id", "vec")
  private lazy val (model, encoded) =
    IvfPqBuilder.fit(df, "id", "vec", dim, config)

  private lazy val curve =
    Calibrate.nprobeRecallCurve(df, "vec", "id", encoded, model,
      k = 5, sampleN = 40).collect()

  test("curve shape: one row per nprobe, monotone, exactly 1.0 at P") {
    assert(curve.length === config.numPartitions)
    assert(curve.map(_.getLong(0)).toSeq ===
      (1L to config.numPartitions.toLong))
    val recalls = curve.map(_.getDouble(3)).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    assert(recalls.last === 1.0)
    val pairs = curve.map(_.getLong(2)).toSet
    assert(pairs.size === 1 && pairs.head === 40L * 5) // sample × k
  }

  test("curve is deterministic under repartitioning") {
    val again = Calibrate
      .nprobeRecallCurve(df.repartition(13), "vec", "id",
        encoded.repartition(7), model, k = 5, sampleN = 40)
      .collect()
    assert(again.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      curve.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("recommend: smallest nprobe reaching the target; bad targets refused") {
    val c = Calibrate.nprobeRecallCurve(df, "vec", "id", encoded, model,
      k = 5, sampleN = 40)
    val np = Calibrate.recommend(c, 0.9)
    val byHand = curve.filter(_.getDouble(3) >= 0.9).map(_.getLong(0)).min
    assert(np.toLong === byHand)
    assert(Calibrate.recommend(c, 1.0).toLong ===
      curve.filter(_.getDouble(3) >= 1.0).map(_.getLong(0)).min)
    intercept[IllegalArgumentException] { Calibrate.recommend(c, 1.5) }
    intercept[IllegalArgumentException] { Calibrate.recommend(c, 0.0) }
  }

  test("theorem: IVF-flat (exact-in-probed-cells) recall equals the curve " +
      "value at every nprobe") {
    val queries = Calibrate.sampleQueries(df, "vec", "id", 40)
    val truth = Calibrate.exactNeighbors(df, "vec", "id", queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (np <- Seq(1, 2, 5, 8)) {
      val got = AnnQuery.batchTopKIvfFlat(encoded, df, "vec", "id", model,
          queries, "qid", "qvec", k = 6, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (q, i) => q != i }.toSet
      val measured = truth.intersect(got).size.toDouble / truth.size
      val curveVal = curve.find(_.getLong(0) == np.toLong).get.getDouble(3)
      assert(measured === curveVal,
        s"nprobe=$np: measured $measured != curve $curveVal")
    }
  }

  test("the promise holds end-to-end: exact-refine ANN at the recommended " +
      "nprobe reaches the curve's recall on the calibration queries") {
    val target = 0.9
    val (np, _) = Calibrate.calibrateNprobe(df, "vec", "id", encoded, model,
      k = 5, sampleN = 40, targetRecall = target)
    val queries = Calibrate.sampleQueries(df, "vec", "id", 40).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toSeq
    val truth = Calibrate.exactNeighbors(df, "vec", "id",
        Calibrate.sampleQueries(df, "vec", "id", 40), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact refine asks for k+1 then drops self: queries are corpus
    // points, so the self-match occupies a slot the truth set excludes
    val got = AnnQuery.batchTopKRerank(encoded, df, "vec", "id", model,
        queries, k = 6, nprobe = np, kFactor = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (q, i) => q != i }
      .toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= target,
      s"promised recall $target at nprobe=$np, measured $recall")
  }

  // ------------------------------------------------------------------
  // round 14: the generalized curves — raw-centroid nprobe calibration
  // (IVF+SQ8 / OPQ share the machinery) and the kFactor curve for the
  // nominate-then-rerank paths
  // ------------------------------------------------------------------

  test("cells overload: the raw-centroid curve is the model curve") {
    val viaCells = Calibrate.nprobeRecallCurveCells(df, "vec", "id",
      encoded, model.partitionCentroids, k = 5, sampleN = 40).collect()
    assert(viaCells.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      curve.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  private lazy val queries40 = Calibrate.sampleQueries(df, "vec", "id", 40)
  private def adcCand(nprobe: Int) =
    Calibrate.adcCandidates(encoded, model, queries40, nprobe)

  test("kFactor curve matches a brute-force nomination-rank histogram") {
    val k = 5
    val maxF = 20
    val cand = adcCand(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = Calibrate.exactNeighbors(df, "vec", "id", queries40, k)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byQ = cand.filter { case (q, i, _) => q != i }.groupBy(_._1)
      .map { case (q, rows) =>
        q -> rows.sortBy(t => (t._3, t._2)).map(_._2).toSeq
      }
    val ranks = truth.flatMap { case (q, id) =>
      byQ.get(q).flatMap { order =>
        val ix = order.indexOf(id)
        if (ix < 0) None else Some(ix + 1)
      }
    }
    val expected =
      (1 to maxF).map(f => ranks.count(_ <= k * f).toDouble / truth.length)
    val got = Calibrate.kFactorRecallCurve(df, "vec", "id", queries40,
        adcCand(3), k, maxF).collect()
    assert(got.map(_.getLong(0)).toSeq === (1L to maxF.toLong))
    assert(got.map(_.getDouble(3)).toSeq === expected)
  }

  test("theorem: with EXACT candidate scores every true pair is " +
      "nominated at f = 1 (ranks coincide with the truth order)") {
    val exactCand = df.join(broadcast(queries40))
      .select(col("qid"), col("id"),
        graft.functions.FastFunctions.squaredL2F(col("vec"), col("qvec"))
          .as("score"))
    val c = Calibrate.kFactorRecallCurve(df, "vec", "id", queries40,
      exactCand, k = 5, maxKFactor = 3).collect()
    assert(c.map(_.getDouble(3)).toSeq === Seq(1.0, 1.0, 1.0))
  }

  test("recommendKFactor: smallest f reaching the target; plateau and " +
      "bad targets refused") {
    val synth = Seq((1L, 100L, 200L, 0.5), (2L, 120L, 200L, 0.6),
        (3L, 120L, 200L, 0.6))
      .toDF("kfactor", "n_hits", "n_pairs", "recall")
    assert(Calibrate.recommendKFactor(synth, 0.5) === 1)
    assert(Calibrate.recommendKFactor(synth, 0.55) === 2)
    intercept[IllegalArgumentException] {
      Calibrate.recommendKFactor(synth, 0.7) // above the plateau
    }
    intercept[IllegalArgumentException] {
      Calibrate.recommendKFactor(synth, 0.0)
    }
    intercept[IllegalArgumentException] {
      Calibrate.recommendKFactor(synth, 1.5)
    }
  }

  test("the kFactor promise holds: nominate(k·f+1) + exact rerank " +
      "recovers at least the curve's recall at every f") {
    val k = 5
    val cand = adcCand(3)
    val curveRows = Calibrate.kFactorRecallCurve(df, "vec", "id",
      queries40, cand, k, 8).collect()
    val truth = Calibrate.exactNeighbors(df, "vec", "id", queries40, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (f <- Seq(1, 2, 4, 8)) {
      val got = Calibrate.rerankDelivered(df, "vec", "id", queries40,
          cand, kNominate = k * f + 1, kFinal = k + 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (q, i) => q != i }.toSet
      val measured = truth.intersect(got).size.toDouble / truth.size
      val promised = curveRows.find(_.getLong(0) == f.toLong).get.getDouble(3)
      assert(measured >= promised,
        s"f=$f: delivered $measured < curve $promised")
    }
  }
}
