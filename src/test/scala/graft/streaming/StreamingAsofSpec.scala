package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // dimension: price history per item
  private val dim = Seq(
    (1L, 100L, 9.99), (1L, 200L, 12.49), (2L, 150L, 3.0))
    .toDF("item", "t", "price")
  private val facts = Seq(
    (1L, 1L, 50L), (2L, 1L, 100L), (3L, 1L, 250L),
    (4L, 2L, 160L), (5L, 3L, 500L)).toDF("fact_id", "item", "t")

  test("batch: latest dimension state at or before each fact time") {
    val r = StreamingAsof.backwardStatic(facts, "item", "t",
        dim, "item", "t", "price")
      .select($"fact_id", $"asof_time", $"asof_price").orderBy("fact_id")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)),
        if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSeq
    assert(r === Seq(
      (1L, None, None),                 // before any price
      (2L, Some(100L), Some(9.99)),     // exact-time tie included
      (3L, Some(200L), Some(12.49)),    // latest of two
      (4L, Some(150L), Some(3.0)),
      (5L, None, None)))                // unknown item
  }

  test("batch agrees with the general AsofJoin on the same inputs") {
    val viaGeneral = graft.operators.AsofJoin.backward(
        facts, dim, Seq("item"), "t", "t", payload = Seq("price"),
        leftSeq = "fact_id", rightSeq = "t")
      .select($"fact_id", $"asof_time", $"asof_price").orderBy("fact_id")
      .collect().toSeq
    val viaStatic = StreamingAsof.backwardStatic(facts, "item", "t",
        dim, "item", "t", "price")
      .select($"fact_id", $"asof_time".cast("long"), $"asof_price")
      .orderBy("fact_id").collect().toSeq
    assert(viaStatic === viaGeneral)
  }

  test("streaming facts: per-trigger enrichment equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long)]
    val sdf = stream.toDF().toDF("fact_id", "item", "t")
    val q = StreamingAsof.backwardStatic(sdf, "item", "t",
        dim, "item", "t", "price")
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, 1L, 50L), (2L, 1L, 100L))
      q.processAllAvailable()
      stream.addData((3L, 1L, 250L), (4L, 2L, 160L))
      q.processAllAvailable()
      val streamed = spark.table("asof_stream")
        .select($"fact_id", $"asof_time", $"asof_price")
        .orderBy("fact_id").collect().toSeq
      val batch = StreamingAsof.backwardStatic(
          facts.where($"fact_id" <= 4), "item", "t", dim, "item", "t", "price")
        .select($"fact_id", $"asof_time", $"asof_price")
        .orderBy("fact_id").collect().toSeq
      assert(streamed === batch)
      assert(streamed.size === 4)
    } finally q.stop()
  }
}
