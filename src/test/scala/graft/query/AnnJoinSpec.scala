package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.pipeline.Dedup

class AnnJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  // 4 separated blobs × 10 seeds × 3 clones: near-dup pairs are clone
  // pairs (cosine ≈ 1), cross-seed/cross-blob cosine is far lower
  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    val blobs = Seq.tabulate(4)(_ => Array.fill(dim)(rnd.nextDouble() * 20 - 10))
    for {
      (blob, b) <- blobs.zipWithIndex
      seed <- 0 until 10
      seedVec = blob.map(v => v + rnd.nextGaussian() * 1.0)
      clone <- 0 until 3
    } yield (((b * 10 + seed) * 3 + clone).toLong,
      seedVec.map(v => (v + rnd.nextGaussian() * 0.01).toFloat).toSeq)
  }

  private lazy val df = data.toDF("vec_id", "embedding")

  private def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cosineSelfJoin: no false positives, full recall on clustered data") {
    val (model, _) = IvfPqBuilder.fit(df, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 8, maxIter = 20))
    val brute = pairs(Dedup.embeddingNearDupPairs(df, thresholdMilli = 999))
    val ivf = pairs(AnnJoin.cosineSelfJoin(df, "vec_id", "embedding",
      model, thresholdMilli = 999, nprobe = 2))
    assert(brute.nonEmpty) // the clone pairs
    assert(ivf.subsetOf(brute), "false positives escaped cosine verification")
    assert(ivf === brute, "missed pairs despite same-cell clones")
  }

  test("cosineSelfJoin: threshold is respected (verified exact cosine)") {
    val (model, _) = IvfPqBuilder.fit(df, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 8, maxIter = 20))
    // impossible threshold → empty
    val none = AnnJoin.cosineSelfJoin(df, "vec_id", "embedding",
      model, thresholdMilli = 1001, nprobe = 2)
    assert(none.count() === 0)
  }
}
