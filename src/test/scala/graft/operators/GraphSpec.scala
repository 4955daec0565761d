package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triangles counts a known graph exactly (K4 + pendant)") {
    // K4 on {1,2,3,4} (4 triangles, every node in 3) plus pendant 5–1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L)).toDF("src", "dst")
    val got = Graph.triangles(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((4L, 3L, 500000L)))   // 2e6·3/(4·3)
    assert(got(2L) === ((3L, 3L, 1000000L)))  // 2e6·3/(3·2)
    assert(got(3L) === ((3L, 3L, 1000000L)))
    assert(got(4L) === ((3L, 3L, 1000000L)))
    assert(got(5L) === ((1L, 0L, 0L)))
  }

  test("triangles collapses duplicates/reversals and self-loops; " +
    "deterministic under repartition") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 3L)).toDF("src", "dst")
    val a = Graph.triangles(messy).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val b = Graph.triangles(messy.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(a === b)
    // one triangle {1,2,3}, every node deg 2 → coef 2e6·1/(2·1) = 1e6
    assert(a === Set((1L, 2L, 1L, 1000000L), (2L, 2L, 1L, 1000000L),
      (3L, 2L, 1L, 1000000L)))
  }

  test("triangles plan: every join is an equality join — no cartesian " +
      "product anywhere") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val plan = Graph.triangles(edges).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("a triangle-free bipartite graph yields zero triangles") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("src", "dst")
    val got = Graph.triangles(edges).collect()
    assert(got.length === 4)
    assert(got.forall(_.getLong(2) === 0L))
  }

  test("hits matches a driver-side integer recompute") {
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L), (3L, 10L))
    val scale = 1000000000L
    // driver recompute with the same max-normalized fixed-point rules
    var h = e.map(_._1).distinct.map(_ -> scale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val araw = e.groupBy(_._2).map { case (v, in) =>
        v -> in.map(x => h(x._1)).sum
      }
      val amax = araw.values.max
      a = araw.map { case (v, r) =>
        v -> (BigInt(r) * scale / amax).toLong
      }
      val hraw = e.groupBy(_._1).map { case (v, out) =>
        v -> out.map(x => a(x._2)).sum
      }
      val hmax = hraw.values.max
      h = hraw.map { case (v, r) =>
        v -> (BigInt(r) * scale / hmax).toLong
      }
    }
    val got = Graph.hits(e.toDF("src", "dst"), iters = 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = h.map { case (v, s) => (v, "hub") -> s } ++
      a.map { case (v, s) => (v, "auth") -> s }
    assert(got === want)
    // 10 is cited by every hub — it must be the top authority at scale
    assert(got((10L, "auth")) === scale)
  }

  test("labelProp: clamped seeds spread by majority with smallest-" +
      "label tie-break; unreached nodes stay unlabeled") {
    // path 1–2–3–4–5–6 with seeds 1→0, 6→7; isolated edge 8–9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (8L, 9L)).toDF("src", "dst")
    val seeds = Seq((1L, 0L), (6L, 7L)).toDF("v", "lbl")
    def run(iters: Int) = Graph.labelProp(edges, seeds, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 round: only the seeds' neighbors pick up labels
    assert(run(1) === Map(1L -> 0L, 6L -> 7L, 2L -> 0L, 5L -> 7L))
    // 2 rounds: 3 and 4 reached; 8, 9 never (no labeled neighbor)
    assert(run(2) === Map(1L -> 0L, 6L -> 7L, 2L -> 0L, 5L -> 7L,
      3L -> 0L, 4L -> 7L))
    // tie: 0 sees one 0-neighbor and one 7-neighbor → smallest label
    val tied = Graph.labelProp(
      (Seq((0L, 1L), (0L, 6L)) ++ Seq((1L, 2L))).toDF("src", "dst"),
      seeds, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tied(0L) === 0L)
    // seeds are CLAMPED: 6's label survives any neighborhood majority
    val swamped = Graph.labelProp(
      Seq((6L, 1L), (6L, 2L), (6L, 3L)).toDF("src", "dst"),
      (Seq((1L, 0L), (2L, 0L), (3L, 0L), (6L, 7L))).toDF("v", "lbl"),
      iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(swamped(6L) === 7L)
  }

  test("kcorePeel: the triangle survives k=2 peeling, the tail peels " +
      "round by round") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    def run(rounds: Int) = Graph.kcorePeel(edges, k = 2, rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 drops only the leaf 5; 4 keeps its (now single) edge
    assert(run(1) === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    // round 2 drops 4; the triangle is the 2-core and is stable after
    assert(run(2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(run(5) === run(2))
  }

  test("hits is invariant to edge duplication and partitioning") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val dup = (base ++ base).toDF("src", "dst")
    val x = Graph.hits(dup, iters = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val y = Graph.hits(base.toDF("src", "dst").repartition(5), iters = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(x === y)
  }
  test("coOccurrence counts shared baskets, dedups multiplicity, and " +
      "drops hub baskets whole") {
    // baskets: 1 {a,b,c}, 2 {a,b}, 3 {a,b} (with a duplicated row),
    // 9 is a 4-item hub dropped by maxBasketSize = 3
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "b"),
      (9L, "a"), (9L, "b"), (9L, "x"), (9L, "y"))
      .toDF("basket", "item")
    val got = Graph.coOccurrence(df, "basket", "item",
        minCount = 1L, maxBasketSize = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L)))
    // support floor prunes the singletons
    val floored = Graph.coOccurrence(df, "basket", "item", 2L, 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(floored === Set(("a", "b", 3L)))
  }
  test("associationRules scores both directions with exact integer " +
      "confidence and lift over the hub-guarded population") {
    // 4 kept baskets: {a,b} ×3, {a} ×1 → n_a=4, n_b=3, n_ab=3, N=4
    // a⇒b: conf 3/4 = 750000, lift 3·4/(4·3) = 1 → 1000000
    // b⇒a: conf 3/3 = 1000000, lift 1000000
    val df = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "a"),
      (9L, "a"), (9L, "b"), (9L, "x")) // hub basket dropped at max 2
      .toDF("basket", "item")
    val got = Graph.associationRules(df, "basket", "item",
        minCount = 2L, maxBasketSize = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === Set(
      ("a", "b", 3L, 4L, 3L, 750000L, 1000000L),
      ("b", "a", 3L, 3L, 4L, 1000000L, 1000000L)))
    // positive association: pair always together in a sparser world
    // baskets {a,b}, {a,b}, {c}, {d} → lift a⇒b = 2·4/(2·2) = 2
    val pos = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "c"), (4L, "d")).toDF("basket", "item")
    val lift = Graph.associationRules(pos, "basket", "item", 2L, 3L)
      .collect().map(_.getLong(6)).toSet
    assert(lift === Set(2000000L))
  }
  test("mergeCoOccurrence folds per-batch pair counts additively and " +
      "re-applies the support floor") {
    val day1 = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("basket", "item")
    val day2 = Seq((3L, "a"), (3L, "b"), (4L, "b"), (4L, "c"))
      .toDF("basket", "item")
    def mine(df: org.apache.spark.sql.DataFrame) =
      Graph.coOccurrence(df, "basket", "item", 1L, 8L)
    val merged = Graph.mergeCoOccurrence(mine(day1), mine(day2),
        minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // (a,b) crosses the floor only when the days combine; (b,c) stays 1
    assert(merged === Set(("a", "b", 3L)))
    val whole = Graph.coOccurrence(day1.unionByName(day2),
        "basket", "item", 2L, 8L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(merged === whole)
  }
  test("coOccurrence and associationRules plan audit: basket-keyed " +
      "joins, no cartesian product") {
    val df = (1L to 60L).map(i => (i / 3, s"i${i % 7}"))
      .toDF("basket", "item")
    val p1 = Graph.coOccurrence(df, "basket", "item", 1L, 8L)
      .queryExecution.executedPlan.toString
    val p2 = Graph.associationRules(df, "basket", "item", 1L, 8L)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct") &&
      !p1.contains("BroadcastNestedLoopJoin"))
    // the 1-row basket total rides a broadcast nested loop by design
    // (scalar crossJoin idiom); the pair/support joins must not
    assert(!p2.contains("CartesianProduct"))
  }
}
