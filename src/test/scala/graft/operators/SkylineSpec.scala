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

  test("frontierND equals brute-force dominance in 3-D and 4-D") {
    val rnd = new scala.util.Random(23)
    val rows3 = (1L to 400L).map(i =>
      (i, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong,
        rnd.nextInt(50).toLong))
    def dom3(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)) =
      a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4 &&
        (a._2 > b._2 || a._3 > b._3 || a._4 > b._4)
    val want3 = rows3.filter(b => !rows3.exists(a => dom3(a, b)))
      .map(_._1).toSet
    val got3 = Skyline.frontierND(rows3.toDF("id", "x", "y", "z"),
        Seq("x", "y", "z"))
      .select("id").as[Long].collect().toSet
    assert(got3 === want3)
    // coarse grid, 4 dims — same answer, only the pruning differs
    val rows4 = (1L to 200L).map(i =>
      (i, rnd.nextInt(10).toLong, rnd.nextInt(10).toLong,
        rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
    def dom4(a: (Long, Long, Long, Long, Long),
             b: (Long, Long, Long, Long, Long)) =
      a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4 && a._5 >= b._5 &&
        (a._2 > b._2 || a._3 > b._3 || a._4 > b._4 || a._5 > b._5)
    val want4 = rows4.filter(b => !rows4.exists(a => dom4(a, b)))
      .map(_._1).toSet
    val got4 = Skyline.frontierND(rows4.toDF("id", "w", "x", "y", "z"),
        Seq("w", "x", "y", "z"), gridBuckets = 6)
      .select("id").as[Long].collect().toSet
    assert(got4 === want4)
  }

  test("frontierND: duplicates co-survive, NULL dims drop, 2-D agrees " +
      "with frontier2D") {
    val dup = Seq((1L, 2L, 2L, 2L), (2L, 2L, 2L, 2L), (3L, 1L, 1L, 1L))
      .toDF("id", "x", "y", "z")
    assert(Skyline.frontierND(dup, Seq("x", "y", "z"))
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    val withNull = Seq((1L, Some(5L), Some(1L)), (2L, None, Some(9L)),
      (3L, Some(1L), Some(9L))).toDF("id", "x", "y")
    assert(Skyline.frontierND(withNull, Seq("x", "y"))
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    val rows = (1L to 80L).map(i =>
      (i, (i * 7919) % 13, (i * 104729) % 17))
    val a = Skyline.frontier2D(rows.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSet
    val b = Skyline.frontierND(rows.toDF("id", "x", "y"), Seq("x", "y"),
        gridBuckets = 5)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    intercept[IllegalArgumentException] {
      Skyline.frontierND(dup, Seq("x", "y", "z"), gridBuckets = 64)
    }
  }

  test("localPrune never drops a true skyline row, even past the window cap") {
    val rnd = new scala.util.Random(41)
    val rows = (1L to 3000L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
        rnd.nextInt(40).toLong))
    def dom(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)) =
      a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4 &&
        (a._2 > b._2 || a._3 > b._3 || a._4 > b._4)
    val want = rows.filter(b => !rows.exists(a => dom(a, b)))
      .map(_._1).toSet
    // window = 2 forces the overflow (stream-through) path constantly;
    // the pre-filter must stay conservative: its OUTPUT superset still
    // contains every true skyline row, and schema/columns round-trip
    val pruned = Skyline.localPrune(
      rows.toDF("id", "x", "y", "z").repartition(4), Seq("x", "y", "z"),
      window = 2)
    assert(pruned.columns.toSeq === Seq("id", "x", "y", "z"))
    val kept = pruned.select("id").as[Long].collect().toSet
    assert(want.subsetOf(kept), s"dropped skyline rows: ${want -- kept}")
    // and the full operator on the same fixture is exact
    val got = Skyline.frontierND(rows.toDF("id", "x", "y", "z"),
        Seq("x", "y", "z"))
      .select("id").as[Long].collect().toSet
    assert(got === want)
  }
}
