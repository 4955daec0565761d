package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SnapshotDiff change classification: inserts, deletes, value updates,
  * null-transition updates, and the silence of unchanged rows. */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def m(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("reserved column names are refused loudly, not resolved ambiguously") {
    val old = Seq((1L, "a")).toDF("k", "old_s")
    val cur = Seq((1L, "b")).toDF("k", "old_s")
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, cur, Seq("k"))
    }
    assert(e.getMessage.contains("old_s"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotDiff.diffRows(Seq((1L, "a")).toDF("k", "change"),
        Seq((1L, "b")).toDF("k", "change"), Seq("k"))
    }
    assert(e2.getMessage.contains("change"))
  }

  test("classifies insert / delete / update and drops unchanged rows") {
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "s", "v")
    val cur = Seq((2L, "b", 20), (3L, "CHANGED", 30), (4L, "d", 40))
      .toDF("k", "s", "v")
    val got = m(SnapshotDiff.diff(old, cur, Seq("k")))
    assert(got === Map(1L -> "delete", 3L -> "update", 4L -> "insert"))
  }

  test("null transitions are updates; null == null is unchanged") {
    val old = Seq((1L, Option("x")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("k", "s")
    val cur = Seq((1L, Option.empty[String]), (2L, Option("y")),
      (3L, Option.empty[String])).toDF("k", "s")
    val got = m(SnapshotDiff.diff(old, cur, Seq("k")))
    assert(got === Map(1L -> "update", 2L -> "update"))
  }

  test("compound keys and column-order robustness") {
    val old = Seq((1L, "p", 5.0), (1L, "q", 6.0)).toDF("k1", "k2", "v")
    val cur = Seq((1L, "q", 6.5), (1L, "p", 5.0))
      .toDF("k1", "k2", "v").select("k2", "v", "k1") // scrambled order
      .select(col("k1"), col("k2"), col("v"))
    val got = SnapshotDiff.diff(old, cur, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, "q", "update")))
  }

  test("identical snapshots produce an empty diff") {
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    assert(SnapshotDiff.diff(a, a, Seq("k")).count() === 0L)
  }

  test("diffRows carries payloads; applyChanges round-trips exactly") {
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val v2 = Seq((2L, "b", 20.0), (3L, "c", 33.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val ch = SnapshotDiff.diffRows(v1, v2, Seq("k"))
    val byK = ch.collect()
      .map(r => r.getLong(0) -> (r.getString(3), Option(r.get(2)))).toMap
    assert(byK(1L)._1 === "delete" && byK(1L)._2.isEmpty) // nulled payload
    assert(byK(3L) === (("update", Some(33.0))))
    assert(byK(4L) === (("insert", Some(40.0))))
    // MERGE replay reconstructs v2 exactly
    val applied = SnapshotDiff.applyChanges(v1, ch, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val want = v2.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(applied === want)
  }

  test("applyChanges on an empty change set is the identity") {
    val v = Seq((1L, "x", 1.0)).toDF("k", "s", "v")
    val ch = SnapshotDiff.diffRows(v, v, Seq("k"))
    assert(ch.count() === 0L)
    assert(SnapshotDiff.applyChanges(v, ch, Seq("k")).collect().toSeq ===
      v.collect().toSeq)
  }

  test("diff plans equi sort-merge joins, never a nested-loop (scale shape)") {
    val a = (0L until 500L).map(i => (i, s"s$i")).toDF("k", "s")
    val b = (250L until 750L).map(i => (i, s"s$i")).toDF("k", "s")
    // string-match: executedPlan.collect does not descend into the
    // AdaptiveSparkPlan wrapper
    val plan = SnapshotDiff.diff(a, b, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"non-equi join shape leaked into the diff:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected an equi full-outer join:\n$plan")
  }
}
