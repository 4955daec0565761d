package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rankInt matches a driver-side integer power iteration") {
    // a small directed graph incl. a sink (4) and a hub (1)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (3L, 4L),
      (2L, 4L)).toDF("src", "dst")
    val got = PageRank.rankInt(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference recompute, same fixed-point rules
    val e = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (3L, 4L), (2L, 4L))
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var s = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 4) {
      val contrib = e.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => s(u) / deg(u) }.sum
      }
      s = nodes.map { v =>
        val c = contrib.getOrElse(v, 0L)
        v -> (150000000L + 85L * (c / 100) + (85L * (c % 100)) / 100)
      }.toMap
    }
    assert(got === s)
    // the hub receiving from 2 and 3 outranks the leaf 2
    assert(got(1L) > got(2L))
  }

  test("deterministic across runs and edge duplication is collapsed") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = PageRank.rankInt(edges, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = PageRank.rankInt(edges.repartition(7), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
