package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The reference's linalg kernel surface (SURVEY.md §2.4) via the
  * higher-order-function variants, and the built-in mappings for
  * sum/min/max_abs. Also pins HOF ≡ fast-kernel equivalence. */
class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Seq(1f, -2f, 3f), Seq(4f, 5f, -6f)))
    .toDF("id", "a", "b")

  test("dot, squaredL2, norms, cosine (HOF) match hand values") {
    val r = df.select(
      VectorFunctions.dot($"a", $"b"),
      VectorFunctions.squaredL2($"a", $"b"),
      VectorFunctions.normSq($"a"),
      VectorFunctions.l2Norm($"b"),
      VectorFunctions.cosine($"a", $"a")).head()
    assert(r.getDouble(0) === 4.0 * 1 - 10 - 18)     // -24
    assert(r.getDouble(1) === 9.0 + 49 + 81)         // 139
    assert(r.getDouble(2) === 14.0)
    assert(math.abs(r.getDouble(3) - math.sqrt(77.0)) < 1e-12)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  test("HOF distance equals the StaticInvoke kernel bit-for-bit") {
    val r = df.select(
      VectorFunctions.squaredL2($"a", $"b"),
      FastFunctions.squaredL2F($"a", $"b"),
      VectorFunctions.dot($"a", $"b"),
      FastFunctions.dotF($"a", $"b")).head()
    assert(r.getDouble(0) === r.getDouble(1))
    assert(r.getDouble(2) === r.getDouble(3))
  }

  test("vecSub / vecAdd / vecScale / subvector") {
    val r = df.select(
      VectorFunctions.vecSub($"a", $"b"),
      VectorFunctions.vecAdd($"a", $"b"),
      VectorFunctions.vecScale($"a", lit(2f)),
      VectorFunctions.subvector($"a", division = 1, numDivisions = 3, dim = 3))
      .head()
    assert(r.getSeq[Float](0) === Seq(-3f, -7f, 9f))
    assert(r.getSeq[Float](1) === Seq(5f, 3f, -3f))
    assert(r.getSeq[Float](2) === Seq(2f, -4f, 6f))
    assert(r.getSeq[Float](3) === Seq(-2f))
  }

  test("sum / min / max_abs via the built-ins SURVEY §2.4 maps them to") {
    val r = df.select(
      aggregate($"a", lit(0.0), (acc, v) => acc + v.cast("double")),
      array_min($"a"),
      array_max(transform($"a", abs(_)))).head()
    assert(r.getDouble(0) === 2.0)
    assert(r.getFloat(1) === -2f)
    assert(r.getFloat(2) === 3f)
  }
}
