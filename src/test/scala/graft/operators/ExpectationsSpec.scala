package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import Expectations._

  // id 3 duplicated; one NULL name; one out-of-range v; one bad status;
  // fk 99 dangles; NULL fk dangles by anti-join semantics
  private lazy val df = Seq(
    (1L, Option("a"), 5.0, "ok", Option(10L)),
    (2L, Option("b"), 50.0, "ok", Option(20L)),
    (3L, Option("c"), 150.0, "bad", Option(99L)),
    (3L, None, 7.0, "ok", None)
  ).toDF("id", "name", "v", "status", "fk")
  private lazy val ref = Seq(10L, 20L, 30L).toDF("k")

  private def counts(rules: Seq[Rule]) =
    violations(df, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("each rule kind counts its violations; NULLs pass range/accepted") {
    val c = counts(Seq(
      NotNull("name"), Unique(Seq("id")), InRange("v", 0.0, 100.0),
      Accepted("status", Seq("ok")), RefersTo("fk", ref, "k")))
    assert(c("not_null:name") === 1L)
    assert(c("unique:id") === 1L) // 4 rows, 3 distinct ids
    assert(c("in_range:v") === 1L) // 150 only; NULL-free column here
    assert(c("accepted:status") === 1L) // "bad"
    assert(c("refers_to:fk") === 2L) // 99 and NULL both dangle
  }

  test("a clean relation yields zero for every rule, one row per rule") {
    val clean = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "name", "v")
    val r = violations(clean, Seq(NotNull("name"), Unique(Seq("id")),
      InRange("v", 0.0, 10.0))).collect()
    assert(r.length === 3)
    assert(r.forall(_.getLong(1) === 0L))
    // sorted by rule name
    assert(r.map(_.getString(0)).toSeq === r.map(_.getString(0)).sorted.toSeq)
  }

  test("multi-column Unique counts rows beyond each group's first") {
    val d = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"))
      .toDF("x", "y")
    val c = violations(d, Seq(Unique(Seq("x", "y")))).head()
    assert(c.getLong(1) === 2L)
  }

  test("random relations: every rule equals its brute-force count") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 5) {
      val rows = (0 until 200).map { _ =>
        (rnd.nextInt(50).toLong,
          if (rnd.nextInt(10) == 0) null else "s" + rnd.nextInt(5),
          rnd.nextDouble() * 200 - 50,
          if (rnd.nextInt(8) == 0) null else Long.box(rnd.nextInt(30).toLong))
      }
      val refKeys = (0L until 20L).toSet
      val d = rows.toDF("k", "s", "v", "fk")
      val ref = refKeys.toSeq.toDF("rk")
      val got = violations(d, Seq(
          NotNull("s"), Unique(Seq("k")), InRange("v", 0.0, 100.0),
          Accepted("s", Seq("s0", "s1", "s2")), RefersTo("fk", ref, "rk")))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      assert(got("not_null:s") === rows.count(_._2 == null).toLong, s"r$round")
      assert(got("unique:k") ===
        (rows.size - rows.map(_._1).distinct.size).toLong, s"r$round")
      assert(got("in_range:v") ===
        rows.count(r => r._3 < 0.0 || r._3 > 100.0).toLong, s"r$round")
      assert(got("accepted:s") === rows.count(r =>
        r._2 != null && !Set("s0", "s1", "s2").contains(r._2)).toLong,
        s"r$round")
      assert(got("refers_to:fk") === rows.count(r =>
        r._4 == null || !refKeys.contains(r._4)).toLong, s"r$round")
    }
  }

  test("validatedStream: clean batches reach the sink, a dirty batch " +
    "fails the query and never reaches it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val seen = scala.collection.mutable.Buffer[(Long, Long)]() // (batch, rows)
    val mem = MemoryStream[(Long, String)]
    val q = Expectations.validatedStream(
      mem.toDF().toDF("id", "name"),
      Seq(NotNull("name"), Unique(Seq("id"))),
      (b, id) => seen += ((id, b.count())))
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(seen.map(_._2).sum === 2L)
      val before = seen.size
      mem.addData((3L, null.asInstanceOf[String]), (3L, "c"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse(e.toString)
      assert(msg.contains("not_null:name=1") && msg.contains("unique:id=1"),
        msg)
      assert(seen.size === before) // the dirty batch never reached the sink
    } finally q.stop()
  }

  test("validated: passes clean data through, fails loudly with counts") {
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "v")
    assert(validated(clean, Seq(Unique(Seq("id")))).count() === 2L)
    val e = intercept[IllegalStateException] {
      validated(df, Seq(NotNull("name"), Unique(Seq("id"))))
    }
    assert(e.getMessage.contains("not_null:name=1"))
    assert(e.getMessage.contains("unique:id=1"))
  }

  test("QuantileAtMost gates on the exact percentile; empty passes") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 100L).toDF("x")
    val v2 = Expectations.violations(df, Seq(
      Expectations.QuantileAtMost("x", qX100 = 90, bound = 90L),
      Expectations.QuantileAtMost("x", qX100 = 99, bound = 10L)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(v2("quantile_at_most:x:p90") === 0L) // 90 <= 90 passes
    assert(v2("quantile_at_most:x:p99") === 1L) // 99 > 10 fails
    val empty = Expectations.violations(df.where(col("x") < 0), Seq(
      Expectations.QuantileAtMost("x", qX100 = 50, bound = 0L)))
      .collect().map(_.getLong(1)).toSeq
    assert(empty === Seq(0L))
  }
  test("NonDecreasing counts adjacent inversions per key, never ties " +
      "or NULLs") {
    import graft.operators.Expectations._
    // key 1: 5, 3(↓), 4, 4 → one inversion at order 2
    // key 2: ties in orderCol (10, 10) walk by value → no inversion
    // key 3: NULL value never violates
    val df = Seq(
      (1L, 1L, Some(5L)), (1L, 2L, Some(3L)), (1L, 3L, Some(4L)),
      (1L, 4L, Some(4L)),
      (2L, 10L, Some(9L)), (2L, 10L, Some(1L)),
      (3L, 1L, Some(7L)), (3L, 2L, None))
      .toDF("k", "o", "v")
    val got = violations(df, Seq(NonDecreasing("v", "o", Seq("k"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("non_decreasing:v:by:o", 1L)))
    // fully sorted data passes
    val ok = Seq((1L, 1L, 1L), (1L, 2L, 2L)).toDF("k", "o", "v")
    assert(violations(ok, Seq(NonDecreasing("v", "o", Seq("k"))))
      .collect()(0).getLong(1) === 0L)
  }
}
