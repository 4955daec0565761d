package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Sketches

/** The quantile value-histogram is additively mergeable state — the
  * same persistable-ingest shape as the LSH band relation and the
  * boilerplate line counts: a stream of batches folds into it via
  * foreachBatch, and quantiles read from the accumulated state equal
  * the batch operator over everything seen. */
class StreamingQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch-merged histograms reproduce the batch quantiles " +
      "after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var state: Option[DataFrame] = None
    val q = stream.toDF().toDF("x")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val h = Sketches.valueHistogram(batch, "x")
        state.synchronized {
          state = Some(state.fold(h)(s =>
            Sketches.mergeValueHistograms(s, h)).localCheckpoint())
        }
        ()
      }
      .start()
    def assertParity(): Unit = {
      val fromState = Sketches
        .quantilesFromHistogram(state.get, Seq(25, 50, 90))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val batch = Sketches
        .exactQuantiles(seen.toSeq.toDF("x"), "x", Seq(25, 50, 90))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(fromState === batch)
    }
    try {
      val first = Seq(5L, 1L, 9L, 9L, 3L)
      stream.addData(first: _*); seen ++= first
      q.processAllAvailable()
      assertParity()
      val second = Seq(2L, 2L, 7L, 11L)
      stream.addData(second: _*); seen ++= second
      q.processAllAvailable()
      assertParity()
    } finally q.stop()
  }
  test("foreachBatch-merged AMS F2 states reproduce the batch sketch " +
      "after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var state: Option[DataFrame] = None
    val q = stream.toDF().toDF("x")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val st = Sketches.f2SketchState(batch, "x", numSketches = 8)
        state.synchronized {
          state = Some(state.fold(st)(s =>
            Sketches.mergeF2States(s, st)).localCheckpoint())
        }
        ()
      }
      .start()
    def assertParity(): Unit = {
      val fromState = Sketches.f2FromState(state.get)
        .collect()(0).getLong(0)
      val batch = Sketches.f2FromState(
          Sketches.f2SketchState(seen.toSeq.toDF("x"), "x", 8))
        .collect()(0).getLong(0)
      assert(fromState === batch)
    }
    try {
      val first = Seq(5L, 1L, 9L, 9L, 3L)
      stream.addData(first: _*); seen ++= first
      q.processAllAvailable()
      assertParity()
      val second = Seq(2L, 9L, 9L, 1L)
      stream.addData(second: _*); seen ++= second
      q.processAllAvailable()
      assertParity()
    } finally q.stop()
  }
}
