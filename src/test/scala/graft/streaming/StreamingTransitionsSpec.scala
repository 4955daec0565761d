package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.EventPipeline.{Step, StepEvent}

/** EventPipeline.transitionSteps must emit exactly the batch lag-window
  * pairs — in batch mode, and incrementally with only the last event
  * per user in state. */
class StreamingTransitionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val events = Seq(
    StepEvent(1L, 10L, 0L, "view"), StepEvent(1L, 20L, 1L, "click"),
    StepEvent(1L, 30L, 2L, "purchase"), StepEvent(2L, 5L, 3L, "view"),
    StepEvent(2L, 6L, 4L, "view"))

  private def batchPairs: Set[(Long, String, String, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events.toDF()
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .select("user_id", "from_type", "event_type", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
  }

  private def asTuple(s: Step) = (s.user_id, s.from_type, s.to_type, s.ts)

  test("batch mode: steps equal the lag-window pairs") {
    val got = EventPipeline.transitionSteps(events.toDS()).collect()
      .map(asTuple).toSet
    assert(got === batchPairs)
    assert(got === Set(
      (1L, "view", "click", 20L), (1L, "click", "purchase", 30L),
      (2L, "view", "view", 6L)))
  }

  test("streaming mode: a step is emitted once, by its completing event") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StepEvent]
    val q = EventPipeline.transitionSteps(stream.toDS())
      .writeStream.format("memory").queryName("steps_stream")
      .outputMode("append").start()
    try {
      stream.addData(events(0), events(3)) // first event per user: no step
      q.processAllAvailable()
      assert(spark.table("steps_stream").count() === 0L)
      stream.addData(events(1), events(4))
      q.processAllAvailable()
      val after2 = spark.table("steps_stream").as[Step].collect()
        .map(asTuple).toSet
      assert(after2 ===
        Set((1L, "view", "click", 20L), (2L, "view", "view", 6L)))
      stream.addData(events(2))
      q.processAllAvailable()
      assert(spark.table("steps_stream").as[Step].collect()
        .map(asTuple).toSet === batchPairs)
    } finally q.stop()
  }

  test("out-of-order arrival across micro-batches fails loudly, " +
      "never emits a backwards step") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StepEvent]
    val q = EventPipeline.transitionSteps(stream.toDS())
      .writeStream.format("memory").queryName("steps_ooo")
      .outputMode("append").start()
    try {
      stream.addData(StepEvent(7L, 100L, 10L, "click"))
      q.processAllAvailable()
      // ts=90 < high-water 100 for entity 7 → contract violation
      stream.addData(StepEvent(7L, 90L, 11L, "view"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("out-of-order arrival")))
      assert(spark.table("steps_ooo").count() === 0L)
    } finally q.stop()
  }
}
