package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // entity 1: three close events, a >gap jump, two more; entity 2: one
  private val rows = Seq(
    (1L, 0L, 10L), (1L, 10L, 11L), (1L, 20L, 12L),
    (1L, 100L, 13L), (1L, 110L, 14L),
    (2L, 5L, 20L)).toDF("user_id", "ts", "event_id")

  test("assign splits at gaps strictly greater than gapNs") {
    val got = Sessionize.assign(rows, "user_id", "ts", "event_id", gapNs = 50)
      .select("user_id", "event_id", "session")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 1L),
      (1L, 13L, 2L), (1L, 14L, 2L),
      (2L, 20L, 1L)))
  }

  test("a gap exactly equal to gapNs does NOT split") {
    val df = Seq((1L, 0L, 1L), (1L, 50L, 2L)).toDF("user_id", "ts", "event_id")
    val got = Sessionize.assign(df, "user_id", "ts", "event_id", gapNs = 50)
      .select("session").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L))
  }

  test("timestamp ties order by the sequence column") {
    // two events at the same ts: the smaller event_id is 'first'; the
    // later one is in the same session regardless of arrival order
    val df = Seq((1L, 100L, 2L), (1L, 100L, 1L), (1L, 300L, 3L))
      .toDF("user_id", "ts", "event_id")
    val got = Sessionize.sessions(df, "user_id", "ts", "event_id",
        gapNs = 50)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === Set((1L, 100L, 100L, 2L), (2L, 300L, 300L, 1L)))
  }

  test("sessions summarizes start/end/count/duration") {
    val got = Sessionize.sessions(rows, "user_id", "ts", "event_id",
        gapNs = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === Set(
      (1L, 1L, 0L, 20L, 3L, 20L),
      (1L, 2L, 100L, 110L, 2L, 10L),
      (2L, 1L, 5L, 5L, 1L, 0L)))
  }
}
