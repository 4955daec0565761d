package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Scd2
import graft.operators.Scd2.{ChangeEvent, ClosedInterval}

/** Scd2.closedHistoryStream must emit exactly the batch operator's
  * CLOSED intervals — in batch mode, and incrementally over a
  * MemoryStream where an interval appears in the micro-batch whose
  * event closes it, never earlier, never twice. */
class StreamingScd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val events = Seq(
    ChangeEvent(1L, 10L, 0L, "free"), ChangeEvent(1L, 20L, 1L, "free"),
    ChangeEvent(1L, 30L, 2L, "paid"), ChangeEvent(1L, 50L, 3L, "free"),
    ChangeEvent(2L, 15L, 4L, "trial"), ChangeEvent(2L, 25L, 5L, "paid"))

  /** Batch operator's closed rows (is_current = 0). */
  private def batchClosed: Set[(Long, String, Long, Long, Long)] =
    Scd2.history(events.toDF(), "user_id", "ts", "event_id", "state")
      .where("is_current = 0")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

  private def asTuple(c: ClosedInterval) =
    (c.user_id, c.state, c.valid_from, c.valid_to, c.n_events)

  test("batch mode: closed intervals equal the batch history's") {
    val got = Scd2.closedHistoryStream(events.toDS()).collect()
      .map(asTuple).toSet
    assert(got === batchClosed)
    assert(got === Set(
      (1L, "free", 10L, 30L, 2L),
      (1L, "paid", 30L, 50L, 1L),
      (2L, "trial", 15L, 25L, 1L)))
  }

  test("streaming mode: an interval is emitted once, by its closing event") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ChangeEvent]
    val q = Scd2.closedHistoryStream(stream.toDS())
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 stays 'free' — nothing closes
      stream.addData(events(0), events(1))
      q.processAllAvailable()
      assert(spark.table("scd2_stream").count() === 0L)
      // batch 2: 'paid' closes the free interval; user 2 opens
      stream.addData(events(2), events(4))
      q.processAllAvailable()
      val after2 = spark.table("scd2_stream").as[ClosedInterval]
        .collect().map(asTuple).toSet
      assert(after2 === Set((1L, "free", 10L, 30L, 2L)))
      // batch 3: both remaining transitions close their intervals
      stream.addData(events(3), events(5))
      q.processAllAvailable()
      val all = spark.table("scd2_stream").as[ClosedInterval]
        .collect().map(asTuple).toSet
      assert(all === batchClosed)
    } finally q.stop()
  }

  test("out-of-order arrival across micro-batches fails loudly, " +
      "never corrupts history") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ChangeEvent]
    val q = Scd2.closedHistoryStream(stream.toDS())
      .writeStream.format("memory").queryName("scd2_ooo")
      .outputMode("append").start()
    try {
      stream.addData(ChangeEvent(9L, 100L, 10L, "paid"))
      q.processAllAvailable()
      // ts=100 ties the high-water mark but a smaller event_id breaks
      // the (ts, id) order → contract violation
      stream.addData(ChangeEvent(9L, 100L, 5L, "free"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("out-of-order arrival")))
      assert(spark.table("scd2_ooo").count() === 0L)
    } finally q.stop()
  }
}
