package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Skyline.frontier2D: dominance semantics, ties, duplicates. */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("frontier2D keeps exactly the non-dominated rows") {
    // (5,1) (3,4) (1,9) form the frontier; (3,3) loses to (3,4);
    // (2,4) loses to (3,4); (5,0) loses to (5,1); (1,1) loses to all
    val df = Seq(
      (1L, 5L, 1L), (2L, 3L, 4L), (3L, 1L, 9L),
      (4L, 3L, 3L), (5L, 2L, 4L), (6L, 5L, 0L), (7L, 1L, 1L))
      .toDF("id", "x", "y")
    val got = Skyline.frontier2D(df, "x", "y")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L))
    // exact duplicates on both dims dominate neither — both survive
    val dup = Seq((1L, 2L, 2L), (2L, 2L, 2L), (3L, 1L, 1L))
      .toDF("id", "x", "y")
    assert(Skyline.frontier2D(dup, "x", "y")
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // equal y at greater x dominates: (2,5) kills (1,5)
    val eq = Seq((1L, 1L, 5L), (2L, 2L, 5L)).toDF("id", "x", "y")
    assert(Skyline.frontier2D(eq, "x", "y")
      .select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("frontier2D equals brute-force dominance on a random fixture") {
    val rows = (1L to 60L).map(i =>
      (i, (i * 7919) % 13, (i * 104729) % 17))
    val got = Skyline.frontier2D(rows.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSet
    val want = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, px, py) =>
        px >= x && py >= y && (px > x || py > y)
      }
    }.map(_._1).toSet
    assert(got === want)
  }
}
