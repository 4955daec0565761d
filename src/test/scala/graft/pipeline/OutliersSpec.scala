package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Outliers.winsorize: exact rank-statistic bounds, clip flags, and the
  * clamped-to-an-input-value guarantee. */
class OutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one group of 20 known values 1..20 → p05 rank ⌈20/20⌉=1 → lo=1,
  // p95 rank ⌈19·20/20⌉=19 → hi=19
  private lazy val df = (1 to 20).map(i => (i.toLong, "g", i.toDouble))
    .toDF("id", "grp", "v").repartition(4)

  test("bounds sit on exact order statistics") {
    val b = Outliers.clipBounds(df, "grp", "v", "id", 1, 20, 19, 20)
      .collect()(0)
    assert((b.getDouble(1), b.getDouble(2), b.getLong(3)) === ((1.0, 19.0, 20L)))
  }

  test("winsorize clamps only the tails and flags the side") {
    val got = Outliers.winsorize(df, "grp", "v", "id")
      .select("id", "v", "clipped").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(got(19) === ((20L, 19.0, 1L)))          // 20 clamped down to hi
    assert(got.count(_._3 === 1L) === 1)           // only the top value
    assert(got.count(_._3 === -1L) === 0)          // lo = min → nothing below
    assert(got.filter(_._3 === 0L).forall(t => t._2 === t._1.toDouble))
  }

  test("clamped values are always group input values; groups independent") {
    val mixed = ((1 to 40).map(i => (i.toLong, "a", i * 10.0)) ++
      (1 to 40).map(i => (100L + i, "b", i * 0.5)))
      .toDF("id", "grp", "v").repartition(6)
    val vals = mixed.select("grp", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    val out = Outliers.winsorize(mixed, "grp", "v", "id")
      .select("grp", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(out.forall(vals.contains)) // never an interpolated value
  }
}
