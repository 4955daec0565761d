package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native BoundedTopK aggregate must be indistinguishable from the
  * udaf Aggregator it replaced — same rows, same order, same ties. */
class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runBoth(rows: Seq[(Long, Double, Long)], k: Int) = {
    val df = rows.toDF("g", "dist", "id")
    def collect(c: org.apache.spark.sql.Column) =
      df.groupBy("g").agg(c.as("hits"))
        .select(col("g"), posexplode(col("hits")).as(Seq("pos", "h")))
        .select(col("g"), col("pos"), col("h.dist"), col("h.id"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    (collect(TopKAggregator.topK(k)(col("dist"), col("id"))),
      collect(TopKAggregator.topKUdaf(k)(col("dist"), col("id"))))
  }

  test("native == udaf on random data across group sizes and k") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      (i % 7L, math.floor(rnd.nextDouble() * 50) / 10.0, // many exact ties
        rnd.nextInt(1000).toLong)
    }
    for (k <- Seq(1, 3, 10, 64)) {
      val (native, ud) = runBoth(rows, k)
      assert(native === ud, s"k=$k")
      assert(native.nonEmpty)
    }
  }

  test("ties break toward the smaller id; k bounds the output per group") {
    val rows = Seq((1L, 2.0, 9L), (1L, 2.0, 3L), (1L, 1.0, 7L),
      (1L, 2.0, 5L), (2L, 0.5, 1L))
    val (native, ud) = runBoth(rows, 3)
    assert(native === ud)
    assert(native.filter(_._1 == 1L).map(t => (t._3, t._4)) ===
      Seq((1.0, 7L), (2.0, 3L), (2.0, 5L)))
    assert(native.count(_._1 == 1L) === 3)
  }

  test("signed zero and extreme values order identically") {
    val rows = Seq((1L, -0.0, 2L), (1L, 0.0, 1L),
      (1L, Double.MinPositiveValue, 3L), (1L, -1e300, 4L), (1L, 1e300, 5L))
    val (native, ud) = runBoth(rows, 5)
    assert(native === ud)
    // -0.0 sorts before 0.0 under Double.compare
    assert(native.map(_._4) === Seq(4L, 2L, 1L, 3L, 5L))
  }

  test("null distances are ignored, not ranked") {
    val df = Seq[(Long, java.lang.Double, java.lang.Long)](
      (1L, 3.0, 1L), (1L, null, 2L), (1L, 1.0, 3L))
      .toDF("g", "dist", "id")
    val got = df.groupBy("g")
      .agg(TopKAggregator.topK(5)(col("dist"), col("id")).as("hits"))
      .select(posexplode(col("hits")).as(Seq("pos", "h")))
      .select(col("h.id")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(3L, 1L))
  }
}
