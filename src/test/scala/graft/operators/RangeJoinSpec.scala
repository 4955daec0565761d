package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** RangeJoin.bucketed vs the naive theta join: identical pair sets, each
  * pair generated exactly once, and no cross-join in the physical plan. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private lazy val left = (0 until 200)
    .map(i => (i.toLong, rnd.nextInt(1000).toLong)).toDF("lid", "lt")
  private lazy val right = (1000 until 1300)
    .map(i => (i.toLong, rnd.nextInt(1000).toLong)).toDF("rid", "rt")

  test("equals the naive theta join; each pair exactly once") {
    val got = RangeJoin.bucketed(left, right, "lt", "rt", lo = 5L, hi = 42L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    val want = left.join(right,
        $"rt" >= $"lt" + 5L && $"rt" <= $"lt" + 42L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === want)
    assert(got.distinct.size === got.size)
    assert(got.nonEmpty)
  }

  test("inclusive bounds: zero-width window [t+c, t+c] still matches") {
    val l = Seq((1L, 100L)).toDF("lid", "lt")
    val r = Seq((2L, 110L), (3L, 111L)).toDF("rid", "rt")
    // lo == hi is rejected (bucket width 0); the minimal window is width 1
    assertThrows[IllegalArgumentException] {
      RangeJoin.bucketed(l, r, "lt", "rt", 10L, 10L)
    }
    val got = RangeJoin.bucketed(l, r, "lt", "rt", 10L, 11L)
      .select("rid").as[Long].collect().toSeq.sorted
    assert(got === Seq(2L, 3L))
  }

  test("extra equi-keys restrict matches") {
    val lk = left.withColumn("k", $"lid" % 3)
    val rk = right.withColumn("k", $"rid" % 3)
    val got = RangeJoin.bucketed(lk, rk, "lt", "rt", 0L, 50L,
        extraKeys = Seq("k"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    val want = lk.as("a").join(rk.as("b"),
        $"a.k" === $"b.k" && $"b.rt" >= $"a.lt" && $"b.rt" <= $"a.lt" + 50L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("plan is an equi-join on buckets, not a cross join") {
    val plan = RangeJoin.bucketed(left, right, "lt", "rt", 0L, 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }
}
