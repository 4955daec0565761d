package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** GroupedTopK vs the window formulation it replaces: identical output on
  * every (group-size, tie) shape, bounded-k semantics, both directions. */
class GroupedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // groups of varying size incl. one smaller than k, with deliberate ties
  private lazy val data: Seq[(String, Long, Int)] = {
    val rnd = new scala.util.Random(11)
    val big = Seq.tabulate(200) { i =>
      ("g" + (i % 4), i.toLong, rnd.nextInt(20)) // many ties in [0,20)
    }
    big ++ Seq(("tiny", 1000L, 5), ("tiny", 1001L, 5)) // |group| < k
  }
  private lazy val df = data.toDF("grp", "id", "score").repartition(7)

  private def windowed(k: Int, descending: Boolean) = {
    val ord = if (descending) col("score").cast("double").desc else
      col("score").cast("double").asc
    val w = Window.partitionBy(col("grp")).orderBy(ord, col("id"))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("grp"), col("rank"), col("id"),
        col("score").cast("double").as("score"))
  }

  private def collectSorted(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).sortBy(t => (t._1, t._2))

  test("matches the window formulation exactly, ties included (desc)") {
    val got = collectSorted(
      GroupedTopK.topPerGroup(df, "grp", "score", "id", 5))
    val want = collectSorted(windowed(5, descending = true))
    assert(got === want)
    // tie rule visible: equal scores ranked by ascending id
    assert(got.nonEmpty)
  }

  test("ascending direction matches the window formulation") {
    val got = collectSorted(
      GroupedTopK.topPerGroup(df, "grp", "score", "id", 3,
        descending = false))
    val want = collectSorted(windowed(3, descending = false))
    assert(got === want)
  }

  test("groups smaller than k emit all their rows, ranks contiguous") {
    val tiny = GroupedTopK.topPerGroup(df, "grp", "score", "id", 5)
      .where(col("grp") === "tiny").collect()
      .map(r => (r.getLong(1), r.getLong(2))).sorted
    assert(tiny === Array((1L, 1000L), (2L, 1001L)))
  }

  test("plan: bounded aggregate with a map-side partial, no window sort") {
    val plan = GroupedTopK.topPerGroup(df, "grp", "score", "id", 5)
      .queryExecution.executedPlan.toString
    // two aggregate stages (partial + final) — the map-side combine that
    // bounds the shuffle at k rows per group per task
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2)
    assert(!plan.contains("Window"))
  }

  test("never more than k rows per group") {
    val counts = GroupedTopK.topPerGroup(df, "grp", "score", "id", 4)
      .groupBy("grp").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 4))
  }
}
