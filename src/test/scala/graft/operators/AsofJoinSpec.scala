package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AsofJoin semantics: backward/forward nearest match, equal-time ties,
  * tolerance bounding, keys isolation. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // left: (id, key, t); right: (id, key, t, v)
  private val left = Seq(
    (1L, 1L, 100L), (2L, 1L, 200L), (3L, 1L, 50L),
    (4L, 2L, 100L), (5L, 3L, 100L)).toDF("event_id", "k", "t")
  private val right = Seq(
    (10L, 1L, 60L, 0.6), (11L, 1L, 100L, 1.0), (12L, 1L, 150L, 1.5),
    (13L, 2L, 300L, 3.0)).toDF("rid", "k", "t", "v")

  private def backward(tol: Option[Long] = None) =
    AsofJoin.backward(left, right, Seq("k"), "t", "t",
        payload = Seq("rid", "v"), leftSeq = "event_id", rightSeq = "rid",
        tolerance = tol)
      .select($"event_id", $"asof_rid", $"asof_v")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq

  test("backward: latest right at or before each left time, per key") {
    assert(backward() === Seq(
      (1L, Some(11L), Some(1.0)),  // t=100: right at EXACTLY 100 matches
      (2L, Some(12L), Some(1.5)),  // t=200: latest is 150
      (3L, None, None),            // t=50: nothing at or before
      (4L, None, None),            // key 2: right exists only at t=300
      (5L, None, None)))           // key 3: no right rows at all
  }

  test("backward tolerance: stale matches null out, rows kept") {
    assert(backward(tol = Some(10L)) === Seq(
      (1L, Some(11L), Some(1.0)),  // staleness 0 <= 10
      (2L, None, None),            // staleness 50 > 10
      (3L, None, None), (4L, None, None), (5L, None, None)))
  }

  test("forward: earliest right at or after each left time") {
    val r = AsofJoin.forward(left, right, Seq("k"), "t", "t",
        payload = Seq("rid"), leftSeq = "event_id", rightSeq = "rid")
      .select($"event_id", $"asof_rid").orderBy("event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    assert(r === Seq(
      (1L, Some(11L)),   // t=100: right at exactly 100
      (2L, None),        // t=200: nothing after
      (3L, Some(10L)),   // t=50: earliest following is 60
      (4L, Some(13L)), (5L, None)))
  }

  test("null payload values ride the MATCHED row, not an older one") {
    val l = Seq((1L, 1L, 300L)).toDF("event_id", "k", "t")
    val rr = Seq((10L, 1L, 100L, Option(5.0)), (11L, 1L, 200L, None))
      .toDF("rid", "k", "t", "v")
    val row = AsofJoin.backward(l, rr, Seq("k"), "t", "t",
        payload = Seq("rid", "v"), leftSeq = "event_id", rightSeq = "rid")
      .select($"asof_time", $"asof_rid", $"asof_v").head()
    // the match is the t=200 row whose v is genuinely NULL — a
    // per-column ignoreNulls carry would smuggle in 5.0 from t=100
    assert(row.getLong(0) === 200L)
    assert(row.getLong(1) === 11L)
    assert(row.isNullAt(2))
  }

  test("equal-time right ties: backward takes the largest rightSeq") {
    val l = Seq((1L, 1L, 100L)).toDF("event_id", "k", "t")
    val rr = Seq((10L, 1L, 100L, 1.0), (11L, 1L, 100L, 2.0))
      .toDF("rid", "k", "t", "v")
    val got = AsofJoin.backward(l, rr, Seq("k"), "t", "t",
        payload = Seq("rid"), leftSeq = "event_id", rightSeq = "rid")
      .select($"asof_rid").head().getLong(0)
    assert(got === 11L)
  }

  test("left columns pass through unchanged") {
    val cols = AsofJoin.backward(left, right, Seq("k"), "t", "t",
      payload = Seq("v"), leftSeq = "event_id", rightSeq = "rid").columns.toSet
    assert(cols === Set("event_id", "k", "t", "asof_time", "asof_v"))
  }

  test("plan: one exchange on the keys, no range cross-join") {
    val plan = AsofJoin.backward(left, right, Seq("k"), "t", "t",
        payload = Seq("v"), leftSeq = "event_id", rightSeq = "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
