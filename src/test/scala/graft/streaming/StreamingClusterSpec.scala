package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Clustering

/** Cluster assignment against a FROZEN model is one stateless codegen
  * projection (nearestCentroidL2 with the centroid table as a literal),
  * so it runs on a stream as-is — the topic-tagging ingest shape: fit
  * once offline, tag every arriving document's embedding per trigger. */
class StreamingClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("assign over a stream equals the batch assignment per trigger") {
    val base = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(4)(j => ((i % 3) * 10 + j).toFloat))
    }
    val model = Clustering.fit(base.toDF("id", "vec"), "vec", k = 3,
      seed = 5, trainPointsPerCentroid = 0)
    val want = Clustering.assign(base.toDF("id", "vec"), "vec", model)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Float])]
    val q = Clustering.assign(stream.toDF().toDF("id", "vec"), "vec", model)
      .writeStream.format("memory").queryName("stream_cluster")
      .outputMode("append").start()
    try {
      stream.addData(base.take(20): _*)
      q.processAllAvailable()
      val first = spark.table("stream_cluster")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(first === want.view.filterKeys(_ < 20).toMap)
      stream.addData(base.drop(20): _*)
      q.processAllAvailable()
      val all = spark.table("stream_cluster")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(all === want)
    } finally q.stop()
  }
}
