package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.{Clustering, Drift}

/** The streaming drift state is an additively-merged k-row cell
  * histogram; PSI read from it after any trigger equals the batch
  * embeddingPsi over the baseline and everything streamed so far. */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(cls: Int, j: Int): Array[Float] =
    Array.tabulate(4)(d => cls * 10.0f + (j % 5) * 0.01f + d * 0.001f)

  test("foreachBatch-merged cell histograms reproduce batch embeddingPsi " +
      "after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    // baseline: two well-separated blobs, 30 + 30
    val baselineRows = (0 until 30).map(j => vec(0, j)) ++
      (0 until 30).map(j => vec(1, j))
    val baseline = baselineRows.map(Tuple1(_)).toDF("emb")
    val model = Clustering.fit(baseline, "emb", k = 2, seed = 3L,
      trainPointsPerCentroid = 0)
    val baseHist = StreamingDrift
      .baselineCells(baseline, "emb", model).localCheckpoint()

    val stream = MemoryStream[Int]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    var state: Option[DataFrame] = None
    // stream elements are (class*1000 + j) codes, decoded in-plan-free
    // driver space here; production streams carry the vectors themselves
    val q = stream.toDS()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Int], _: Long) =>
        val vecs = batch.collect().toSeq
          .map(code => Tuple1(vec(code / 1000, code % 1000)))
        val df = vecs.toDF("emb")
        val h = StreamingDrift.cellCounts(df, "emb", model)
        state.synchronized {
          state = Some(state.fold(h)(s =>
            StreamingDrift.mergeCellCounts(s, h)).localCheckpoint())
        }
        ()
      }
      .start()
    def assertParity(): Unit = {
      val fromState = StreamingDrift
        .psiVsBaseline(baseHist, state.get, model)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      val batchPsi = Drift.embeddingPsiBuckets(baseline,
          seen.toSeq.map(Tuple1(_)).toDF("emb"), "emb", model)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(fromState === batchPsi)
      // and the summary row equals the bucket sum
      val s = StreamingDrift.psiSummary(baseHist, state.get, model)
        .collect()(0)
      assert(s.getLong(0) === fromState.values.map(_._3).sum)
      // chi-square rides the SAME accumulated state: parity with the
      // one-shot batch computation over everything seen so far
      val chiState = StreamingDrift
        .chiSquareVsBaseline(baseHist, state.get, model)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      val chiBatch = Drift.chiSquareFromCellCounts(baseHist,
          StreamingDrift.cellCounts(
            seen.toSeq.map(Tuple1(_)).toDF("emb"), "emb", model),
          model.k)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      assert(chiState === chiBatch)
    }
    try {
      // trigger 1: balanced batch — mild drift only from count scale
      val first = (0 until 10).map(j => j) ++ (0 until 10).map(j => 1000 + j)
      stream.addData(first: _*)
      seen ++= first.map(code => vec(code / 1000, code % 1000))
      q.processAllAvailable()
      assertParity()
      // trigger 2: one-sided batch — the mix shifts toward blob B
      val second = (10 until 40).map(j => 1000 + j)
      stream.addData(second: _*)
      seen ++= second.map(code => vec(code / 1000, code % 1000))
      q.processAllAvailable()
      assertParity()
      // after the one-sided batch the shift is loud
      val s = StreamingDrift.psiSummary(baseHist, state.get, model)
        .collect()(0)
      assert(s.getLong(0) > 100000L)
    } finally q.stop()
  }
}
