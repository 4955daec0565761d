package graft.operators

import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Sketches

/** Randomized brute-force equivalence for the round-6 operators whose
  * hand-picked spec cases can't cover the input space: SnapshotDiff /
  * applyChanges round trips, SCD2 gaps-and-islands, and Misra-Gries
  * heavy hitters, each checked against a from-first-principles Scala
  * reference on arbitrary generated inputs. */
class OperatorPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Run a ScalaCheck property, failing the suite with its message. */
  private def check(prop: Prop): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  // small keyed tables with overlapping key ranges and repeated values
  private val snapshotGen: Gen[Seq[(Long, String, Int)]] =
    Gen.listOf(for {
      k <- Gen.choose(0L, 15L)
      s <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 3)
    } yield (k, s, v)).map(_.groupBy(_._1).map(_._2.head).toSeq) // unique keys

  test("diff/diffRows/applyChanges equal a set-arithmetic reference") {
    check(forAll(snapshotGen, snapshotGen) { (o, c) =>
      val old = o.toDF("k", "s", "v")
      val cur = c.toDF("k", "s", "v")
      val om = o.map(t => t._1 -> ((t._2, t._3))).toMap
      val cm = c.map(t => t._1 -> ((t._2, t._3))).toMap
      val want = (om.keySet ++ cm.keySet).flatMap { k =>
        (om.get(k), cm.get(k)) match {
          case (None, Some(_)) => Some(k -> "insert")
          case (Some(_), None) => Some(k -> "delete")
          case (Some(a), Some(b)) if a != b => Some(k -> "update")
          case _ => None
        }
      }.toMap
      val got = SnapshotDiff.diff(old, cur, Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val applied = SnapshotDiff.applyChanges(old,
          SnapshotDiff.diffRows(old, cur, Seq("k")), Seq("k"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .toSet
      Prop(got == want) :| s"diff: got $got want $want" &&
        Prop(applied == c.toSet) :| s"round-trip: got $applied want ${c.toSet}"
    })
  }

  // per-entity logs with ts collisions (seq breaks them) and few states
  private val logGen: Gen[Seq[(Long, Long, Long, String)]] =
    Gen.listOf(for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 6L)
      s <- Gen.oneOf("x", "y")
    } yield (u, t, s)).map(_.zipWithIndex
      .map { case ((u, t, s), i) => (u, t, i.toLong, s) })

  test("Scd2.history equals a sequential fold over each entity's log") {
    check(forAll(logGen) { rows =>
      val got = Scd2.history(rows.toDF("u", "ts", "seq", "st"),
          "u", "ts", "seq", "st")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      val want = rows.groupBy(_._1).flatMap { case (u, evs) =>
        val ordered = evs.sortBy(e => (e._2, e._3))
        // fold into (state, from, count) runs
        val runs = ordered.foldLeft(Vector.empty[(String, Long, Long)]) {
          case (acc, (_, t, _, s)) =>
            if (acc.nonEmpty && acc.last._1 == s)
              acc.init :+ acc.last.copy(_3 = acc.last._3 + 1)
            else acc :+ ((s, t, 1L))
        }
        runs.zipWithIndex.map { case ((s, from, n), i) =>
          val to = if (i + 1 < runs.length) runs(i + 1)._2 else -1L
          (u, s, from, to, n, if (to == -1L) 1L else 0L)
        }
      }.toSet
      Prop(got == want) :| s"got $got want $want"
    })
  }

  private val itemsGen: Gen[(Seq[String], Int)] = for {
    n <- Gen.choose(1, 400)
    zipf <- Gen.listOfN(n, Gen.frequency(
      (6, Gen.const("hot")), (3, Gen.const("warm")),
      (2, Gen.oneOf("c1", "c2", "c3")),
      (4, Gen.choose(0, 200).map(i => s"cold$i"))))
    k <- Gen.choose(2, 12)
  } yield (zipf, k)

  test("heavyHitters equals the exact freq > n/k set on arbitrary streams") {
    check(forAll(itemsGen) { case (items, k) =>
      val got = Sketches
        .heavyHitters(items.toDF("item").repartition(5), "item", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = items.length
      val want = items.groupBy(identity).view.mapValues(_.length.toLong)
        .filter(_._2 * k > n).toMap
      Prop(got == want) :| s"n=$n k=$k got $got want $want"
    })
  }

  // grouped doubles with ties and tiny/large groups
  private val groupedGen: Gen[Seq[(Long, String, Double)]] =
    Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("g1", "g2")
      v <- Gen.choose(0, 12).map(_.toDouble)
    } yield (g, v)).map(_.zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) })

  /** Lower median by the operator's (value, id) rank convention. */
  private def lowerMedian(vs: Seq[(Double, Long)]): Double = {
    val sorted = vs.sortBy(identity)
    sorted(((sorted.length + 1) / 2) - 1)._1
  }

  test("winsorize equals brute-force rank bounds on arbitrary groups") {
    check(forAll(groupedGen) { rows =>
      val df = rows.toDF("id", "grp", "v").repartition(3)
      val got = graft.pipeline.Outliers.winsorize(df, "grp", "v", "id")
        .select("id", "v", "clipped").collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      val want = rows.groupBy(_._2).flatMap { case (_, grp) =>
        val sorted = grp.map(t => (t._3, t._1)).sortBy(identity)
        val n = sorted.length
        val lo = sorted((n * 1 + 19) / 20 - 1)._1
        val hi = sorted((n * 19 + 19) / 20 - 1)._1
        grp.map { case (id, _, v) =>
          val c = if (v < lo) -1L else if (v > hi) 1L else 0L
          id -> ((math.min(math.max(v, lo), hi), c))
        }
      }
      Prop(got == want) :| s"got $got want $want"
    })
  }

  test("madOutliers equals brute-force median/MAD on arbitrary groups") {
    check(forAll(groupedGen) { rows =>
      val df = rows.toDF("id", "grp", "v").repartition(3)
      val got = graft.pipeline.Outliers.madOutliers(df, "grp", "v", "id")
        .select("id", "is_outlier").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(_._2).flatMap { case (_, grp) =>
        val med = lowerMedian(grp.map(t => (t._3, t._1)))
        val mad = lowerMedian(grp.map(t => (math.abs(t._3 - med), t._1)))
        grp.map { case (id, _, v) =>
          id -> (if (math.abs(v - med) > 3.0 * mad) 1L else 0L)
        }
      }
      Prop(got == want) :| s"got $got want $want"
    })
  }

  test("exactQuantiles equals the sorted-rank reference on arbitrary lists") {
    val valsGen = Gen.nonEmptyListOf(Gen.choose(-50L, 50L))
    check(forAll(valsGen) { vals =>
      val df = vals.toDF("x")
      val qs = Seq(1, 37, 50, 99, 100)
      val got = Sketches.exactQuantiles(df, "x", qs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val sorted = vals.sorted
      qs.forall { q =>
        val rank = (q.toLong * vals.length + 99) / 100
        got(q.toLong) == sorted(rank.toInt - 1)
      }
    })
  }

  test("saltedInnerJoin output equals the plain join for arbitrary tables") {
    val rowsGen = Gen.listOf(for {
      k <- Gen.choose(0L, 6L)
      v <- Gen.choose(0, 9)
    } yield (k, v))
    check(forAll(rowsGen, rowsGen, Gen.choose(1, 6)) { (l, r, salt) =>
      val lf = l.toDF("k", "lv")
      val rf = r.toDF("k", "rv")
      val got = SkewJoin.saltedInnerJoin(lf, rf, Seq("k"), salt)
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2)))
        .sorted.toSeq
      val want = lf.join(rf, Seq("k"))
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2)))
        .sorted.toSeq
      got == want
    })
  }

  test("PageRank.rankInt equals a driver fold on arbitrary digraphs") {
    val edgeGen = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 7L)
      b <- Gen.choose(0L, 7L)
    } yield (a, b))
    check(forAll(edgeGen, Gen.choose(1, 3)) { (edges0, iters) =>
      val edges = edges0.distinct
      val got = PageRank.rankInt(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var s = nodes.map(_ -> 1000000000L).toMap
      for (_ <- 1 to iters) {
        val contrib = edges.groupBy(_._2).map { case (v, in) =>
          v -> in.map { case (u, _) => s(u) / deg(u) }.sum
        }
        s = nodes.map { v =>
          val c = contrib.getOrElse(v, 0L)
          v -> (150000000L + 85L * (c / 100) + (85L * (c % 100)) / 100)
        }.toMap
      }
      got == s
    })
  }

  test("clusterQuotas: proportional sums exactly to total, balanced " +
      "spread <= 1, both modes sum to total") {
    val sizesGen = Gen.nonEmptyListOf(Gen.choose(1, 20))
      .map(_.take(5).zipWithIndex)
    check(forAll(sizesGen, Gen.choose(0L, 40L)) { (sizes, total) =>
      val rows = sizes.flatMap { case (n, c) =>
        (0 until n).map(i => (c.toLong * 1000 + i, c.toLong))
      }
      val df = rows.toDF("id", "cluster")
      val prop = graft.pipeline.Clustering
        .clusterQuotas(df, total, "proportional")
        .collect().map(_.getLong(1))
      val bal = graft.pipeline.Clustering
        .clusterQuotas(df, total, "balanced")
        .collect().map(_.getLong(1))
      prop.sum == total && bal.sum == total &&
        (bal.max - bal.min) <= 1 && prop.forall(_ >= 0)
    })
  }

  // random small multigraphs (dups/reversals/self-loops included)
  private val edgeGen: Gen[Seq[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 11L)
      b <- Gen.choose(0L, 11L)
    } yield (a, b))

  test("triangles equals a brute-force census on arbitrary graphs") {
    check(forAll(edgeGen) { es =>
      val und = es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .filter(e => e._1 != e._2).distinct.toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val deg = nodes.map(v =>
        v -> und.count(e => e._1 == v || e._2 == v).toLong).toMap
      def adj(u: Long, v: Long) =
        und(( math.min(u, v), math.max(u, v) ))
      val tri = nodes.map { v =>
        val others = nodes.filter(_ != v)
        v -> (for {
          i <- others.indices; j <- (i + 1) until others.size
          if adj(v, others(i)) && adj(v, others(j)) &&
            adj(others(i), others(j))
        } yield 1).size.toLong
      }.toMap
      val want = nodes.map { v =>
        val d = deg(v)
        val coef = if (d >= 2) 2000000L * tri(v) / (d * (d - 1)) else 0L
        (v, d, tri(v), coef)
      }.toSet
      val got = Graph.triangles(es.toDF("src", "dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      und.isEmpty || got == want
    })
  }
  test("sortedNeighborPairs with a window spanning the block equals " +
      "brute-force pairs on arbitrary short strings") {
    // with ONE block and window >= n-1 the rank band covers every
    // pair, so the generator is complete and must equal brute force
    val genStrs = Gen.listOfN(8,
      Gen.listOfN(4, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    check(forAll(genStrs) { strs =>
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = rows.toDF("id", "s")
        .withColumn("bk", org.apache.spark.sql.functions.lit("one"))
      val got = graft.pipeline.Dedup
        .sortedNeighborPairs(df, "id", "s", "bk",
          window = rows.size, maxDist = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for {
        (a, i) <- rows.zipWithIndex
        (b, j) <- rows.zipWithIndex if i < j
        if lev(a._2, b._2) <= 1
      } yield (math.min(a._1, b._1), math.max(a._1, b._1))).toSet
      got == want
    })
  }

  test("chiSquare contributions equal a driver recompute on arbitrary " +
      "bucketed snapshots") {
    import graft.pipeline.Drift
    val genCounts = Gen.listOfN(6, Gen.choose(0L, 40L))
    check(forAll(genCounts, genCounts) { (as, bs) =>
      // vacuously true when a side is empty (the operator requires
      // non-empty snapshots; its totals would be 0)
      (as.sum == 0 || bs.sum == 0) || {
        val a = as.zipWithIndex.flatMap { case (c, i) =>
          Seq.fill(c.toInt)(i.toDouble * 10 + 5) }
        val b = bs.zipWithIndex.flatMap { case (c, i) =>
          Seq.fill(c.toInt)(i.toDouble * 10 + 5) }
        val got = Drift.chiSquareBuckets(a.map(Tuple1(_)).toDF("v"),
            b.map(Tuple1(_)).toDF("v"), "v", 10.0, 6)
          .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
        val na = as.sum.toDouble; val nb = bs.sum.toDouble
        val want = (0 until 6).map { i =>
          val d = (as(i) * bs.sum - bs(i) * as.sum).toDouble
          val cell = (as(i) + bs(i)).toDouble
          i.toLong -> (if (cell == 0) 0L
            else math.floor(d * d / (na * nb) / cell * 1e6).toLong)
        }.toMap
        got == want
      }
    })
  }
  test("associationRules confidence and lift equal a driver recompute " +
      "on arbitrary basket tables") {
    import graft.operators.Graph
    val genBi = Gen.listOfN(30, for {
      b <- Gen.choose(0L, 7L); i <- Gen.oneOf("a", "b", "c", "d")
    } yield (b, i))
    check(forAll(genBi) { bi =>
      val df = bi.toDF("basket", "item")
      val got = Graph.associationRules(df, "basket", "item",
          minCount = 1L, maxBasketSize = 3L)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6)))).toMap
      // driver reference over the same hub-guarded population
      val distinctBi = bi.distinct
      val sizes = distinctBi.groupBy(_._1).map { case (k, v) =>
        k -> v.size }
      val kept = distinctBi.filter(t => sizes(t._1) <= 3)
      val n = kept.map(_._1).distinct.size.toLong
      val supp = kept.groupBy(_._2).map { case (k, v) =>
        k -> v.size.toLong }
      val pairs = kept.groupBy(_._1).values.flatMap { items =>
        val is = items.map(_._2).sorted
        for (x <- is; y <- is if x < y) yield (x, y)
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val want = pairs.flatMap { case ((x, y), nab) =>
        Seq((x, y, nab, supp(x), supp(y)), (y, x, nab, supp(y), supp(x)))
      }.map { case (ant, cons, nab, na, nc) =>
        (ant, cons) -> ((nab, na, nc, nab * 1000000L / na,
          nab * n * 1000000L / (na * nc)))
      }.toMap
      got == want
    })
  }
}
