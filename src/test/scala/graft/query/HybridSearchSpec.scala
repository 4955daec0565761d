package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rrfFuse: hand-checked integer RRF over two lists") {
    // 1e6 div (60 + r): r=1 -> 16393, r=2 -> 16129, r=3 -> 15873
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = HybridSearch.rrfFuse(Seq(a, b), "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 20L, 16129L + 16393L, 2L), // in both lists — dominates
      (2L, 10L, 16393L, 1L),
      (3L, 40L, 16129L, 1L),
      (4L, 30L, 15873L, 1L)))
  }

  test("rrfFuse: ties break on id; k truncates after fusion") {
    val a = Seq((7L, 1L), (5L, 2L)).toDF("doc_id", "rank")
    val b = Seq((5L, 1L), (7L, 2L)).toDF("doc_id", "rank")
    // both docs score 16393 + 16129 — tie resolved by id
    val got = HybridSearch.rrfFuse(Seq(a, b), "doc_id", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 5L)))
  }

  test("rrfFuse: single list degenerates to the input order") {
    val a = Seq((3L, 1L), (1L, 2L), (2L, 3L)).toDF("doc_id", "rank")
    val got = HybridSearch.rrfFuse(Seq(a), "doc_id", k = 10)
      .select("rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 3L), (2L, 1L), (3L, 2L)))
  }
}
