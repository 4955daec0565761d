package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming anomaly state is an additively-merged per-(type, day)
  * count relation; flags read from it after any trigger equal the
  * batch dailyAnomalies over everything streamed so far. */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000000L

  test("foreachBatch-merged day counts reproduce batch dailyAnomalies " +
      "after every trigger, and the planted spike flags") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var state: Option[DataFrame] = None
    val q = stream.toDS().toDF("ts", "event_type")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val h = StreamingAnomaly.dayCounts(batch, "ts", "event_type")
        state.synchronized {
          state = Some(state.fold(h)(s =>
            StreamingAnomaly.mergeDayCounts(s, h)).localCheckpoint())
        }
        ()
      }
      .start()
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    def assertParity(): Unit = {
      val fromState = rows(StreamingAnomaly.flags(state.get))
      val batch = rows(EventPipeline.dailyAnomalies(
        seen.toSeq.toDF("ts", "event_type"), "ts", "event_type"))
      assert(fromState === batch)
      // CUSUM rides the SAME accumulated day-count state
      val cusumState = EventPipeline
        .cusumShifts(state.get, drift = 5L, threshold = 10L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
        .toSet
      val cusumBatch = EventPipeline.cusumShifts(
          EventPipeline.dailyCounts(
            seen.toSeq.toDF("ts", "event_type"), "ts", "event_type"),
          drift = 5L, threshold = 10L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
        .toSet
      assert(cusumState === cusumBatch)
    }
    try {
      // trigger 1: steady days 0..7, 5 events each — and note day 7
      // arrives SPLIT across triggers (2 now, 3 later): the additive
      // state must reassemble it
      val first = (0 to 6).flatMap(d =>
        (0 until 5).map(i => (d * day + i, "a"))) ++
        (0 until 2).map(i => (7L * day + i, "a"))
      stream.addData(first: _*)
      seen ++= first
      q.processAllAvailable()
      assertParity()
      // trigger 2: the rest of day 7, steady days 8..9, then a 12x
      // spike on day 10
      val second = (2 until 5).map(i => (7L * day + i, "a")) ++
        (8 to 9).flatMap(d => (0 until 5).map(i => (d * day + i, "a"))) ++
        (0 until 60).map(i => (10L * day + i, "a"))
      stream.addData(second: _*)
      seen ++= second
      q.processAllAvailable()
      assertParity()
      val flagged = StreamingAnomaly.flags(state.get)
        .where($"is_anom" === 1).collect()
      assert(flagged.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
        Seq((10L, 60L)))
    } finally q.stop()
  }
}
