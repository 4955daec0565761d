package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Forward-fill resampling semantics: aligned per-key grids, inclusive
  * tick fill, exact-time tie-break, span-too-short keys. */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val events = Seq(
    // key A: fills across gaps; later events shadow earlier ones
    ("a", 5L, 1L, 10.0), ("a", 25L, 2L, 20.0), ("a", 40L, 3L, 30.0),
    // key B: span straddles no aligned tick -> no output
    ("b", 7L, 4L, 99.0),
    // key C: event exactly ON the tick is visible to it (inclusive);
    // two events at the same ts -> the larger seq wins
    ("c", 10L, 5L, 1.0), ("c", 10L, 6L, 2.0))
    .toDF("k", "ts", "seq", "v")

  test("forwardFill: aligned grid, inclusive backward fill, tie by seq, " +
      "short spans emit nothing") {
    val out = Resample.forwardFill(events, Seq("k"), "ts", "seq", "v",
        stepUnits = 10L)
      .orderBy("k", "grid_ts")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 10L, 10.0, 5L), ("a", 20L, 10.0, 5L),
      ("a", 30L, 20.0, 25L), ("a", 40L, 30.0, 40L),
      ("c", 10L, 2.0, 10L)))
  }

  test("interpolate: exact lerp between surrounding observations, " +
      "on-observation ticks take the observed value") {
    val out = Resample.interpolate(events, Seq("k"), "ts", "seq", "v",
        stepUnits = 10L)
      .orderBy("k", "grid_ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    // a: obs (5,10.0) (25,20.0) (40,30.0)
    //   t=10: 10 + (20-10)*(5/20) = 12.5 ; t=20: 10 + 10*(15/20) = 17.5
    //   t=30: 20 + 10*(5/15) ; t=40: on-observation -> 30
    assert(out === Seq(
      ("a", 10L, 12.5), ("a", 20L, 17.5),
      ("a", 30L, 20.0 + 10.0 * (5.0 / 15.0)), ("a", 40L, 30.0),
      ("c", 10L, 2.0)))
  }

  test("forwardFill: every tick has a value by construction (no " +
      "leading nulls) on random data") {
    val rnd = new scala.util.Random(3)
    val ev = (0 until 400).map { i =>
      (s"u${i % 7}", rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble())
    }.toDF("k", "ts", "seq", "v")
    val out = Resample.forwardFill(ev, Seq("k"), "ts", "seq", "v", 50L)
    assert(out.where("value IS NULL OR src_ts IS NULL").count() === 0L)
    // grid ticks are step-aligned and within each key's span
    assert(out.where("grid_ts % 50 != 0").count() === 0L)
  }
}
