package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scd2.history gaps-and-islands semantics: consecutive-duplicate
  * collapse, half-open interval chaining, tie-breaking by the sequence
  * column, and the current-row flag. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hist(rows: Seq[(Long, Long, Long, String)]) =
    Scd2.history(rows.toDF("u", "ts", "seq", "st").repartition(5),
        "u", "ts", "seq", "st")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._3))

  test("collapses consecutive duplicates and chains intervals") {
    val got = hist(Seq(
      (1L, 10L, 0L, "free"), (1L, 20L, 1L, "free"), (1L, 30L, 2L, "paid"),
      (1L, 40L, 3L, "paid"), (1L, 50L, 4L, "free")))
    assert(got.toSeq === Seq(
      (1L, "free", 10L, 30L, 2L, 0L),
      (1L, "paid", 30L, 50L, 2L, 0L),
      (1L, "free", 50L, -1L, 1L, 1L)))
  }

  test("re-entering an earlier state opens a NEW interval (type 2)") {
    val got = hist(Seq(
      (7L, 1L, 0L, "a"), (7L, 2L, 1L, "b"), (7L, 3L, 2L, "a")))
    assert(got.length === 3) // a, b, a — not merged
    assert(got.map(_._2).toSeq === Seq("a", "b", "a"))
  }

  test("timestamp ties break by the sequence column") {
    // same ts: seq order decides which state is 'later'
    val got = hist(Seq((2L, 5L, 1L, "x"), (2L, 5L, 2L, "y")))
    assert(got.toSeq === Seq(
      (2L, "x", 5L, 5L, 1L, 0L),
      (2L, "y", 5L, -1L, 1L, 1L)))
  }

  test("entities are independent; single-event entity is current") {
    val got = hist(Seq((1L, 1L, 0L, "a"), (2L, 9L, 0L, "z")))
    assert(got.toSeq === Seq(
      (1L, "a", 1L, -1L, 1L, 1L),
      (2L, "z", 9L, -1L, 1L, 1L)))
  }

  test("history plans ONE hash exchange and one sort (scale shape)") {
    val df = Scd2.history(
      (0 until 200).map(i => ((i % 7).toLong, (i / 7).toLong, i.toLong,
        if (i % 3 == 0) "a" else "b")).toDF("u", "ts", "seq", "st"),
      "u", "ts", "seq", "st")
    // count on the rendered plan: executedPlan.collect does not descend
    // into the AdaptiveSparkPlan wrapper
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"want 1 exchange:\n$plan")
    assert("\\bSort \\[".r.findAllIn(plan).size === 1,
      s"want 1 sort:\n$plan")
  }
}
