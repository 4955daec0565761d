package graft.query

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
}
