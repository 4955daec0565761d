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

  test("madOutliers: flags only genuine deviants; statistics are robust") {
    // group of 11: values 1..10 plus one wild 1000.
    // median = 6 (lower median of 11), devs |x-6|: 0..5 and 994;
    // MAD = lower median of {0,1,1,2,2,3,3,4,4,5,994} = 3 (rank 6)
    // threshold 3*MAD = 9 -> only the 1000 row (dev 994) is flagged
    val df = ((1 to 10).map(i => (i.toLong, "g", i.toDouble)) :+
      (99L, "g", 1000.0)).toDF("id", "grp", "v").repartition(3)
    val got = Outliers.madOutliers(df, "grp", "v", "id")
      .select("id", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(99L) === 1L)
    assert(got.filterNot(_._1 == 99L).values.forall(_ === 0L))
    // a mean/stddev rule with this wild row would flag nothing:
    // mean ~96, stddev ~285 -- the 1000 sits well inside mean+3*sigma.
    // MAD still catches it; that asymmetry is the point of the operator.
  }

  test("madOutliers: constant groups (MAD = 0) flag any deviation") {
    val df = (Seq((1L, "c", 5.0), (2L, "c", 5.0), (3L, "c", 5.0),
      (4L, "c", 5.1))).toDF("id", "grp", "v")
    val got = Outliers.madOutliers(df, "grp", "v", "id")
      .select("id", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // median 5.0, devs {0,0,0,0.1}, MAD 0 -> 0.1 > 0 flags id 4 only
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }
}
