package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (Option(1L), Option("a"), Option(1.5)),
    (Option(2L), Option("b"), Option(1.5)),
    (Option(2L), None, Option(-3.0)),
    (None, Option("a"), None)
  ).toDF("id", "s", "v")

  test("profile: per-column counters in schema order, NULL-aware") {
    val r = Profile.profile(df).collect()
    assert(r.map(_.getString(0)).toSeq === Seq("id", "s", "v"))
    val byCol = r.map(x => x.getString(0) ->
      (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getString(4), x.getString(5))).toMap
    assert(byCol("id") === ((4L, 1L, 2L, "1", "2")))
    assert(byCol("s") === ((4L, 1L, 2L, "a", "b")))
    assert(byCol("v") === ((4L, 1L, 2L, "-3.0", "1.5")))
  }

  test("profile: empty relation gives zero counts and NULL min/max") {
    val r = Profile.profile(df.where("id > 100")).collect()
    assert(r.length === 3)
    r.foreach { x =>
      assert(x.getLong(1) === 0L && x.getLong(2) === 0L && x.getLong(3) === 0L)
      assert(x.isNullAt(4) && x.isNullAt(5))
    }
  }

  test("profile: approx mode stays within HLL tolerance on 1k distincts") {
    val big = (0 until 1000).map(i => (i.toLong, s"k${i % 100}"))
      .toDF("id", "k")
    val r = Profile.profile(big, exact = false).collect()
      .map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(math.abs(r("id") - 1000L) <= 100L)
    assert(math.abs(r("k") - 100L) <= 10L)
  }
}
