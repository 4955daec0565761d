package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RankEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val results = Seq(
    (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
    (2L, 40L, 1L), (2L, 50L, 2L)
  ).toDF("qid", "doc_id", "rank")
  // q1 relevant: 20, 30, 99 (99 not retrieved); q2 has no relevant docs
  private lazy val truth = Seq((1L, 20L), (1L, 30L), (1L, 99L))
    .toDF("qid", "doc_id")

  test("perQuery: hand-computed counters, zero-truth query included") {
    val r = RankEval.perQuery(results, truth).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) === ((3L, 3L, 2L, 2L))) // first hit is doc 20 at rank 2
    assert(r(2L) === ((2L, 0L, 0L, 0L)))
  }

  test("summary: P@k, recall (zero-truth excluded), MRR, hit rate") {
    val s = RankEval.summary(RankEval.perQuery(results, truth)).head()
    assert(s.getLong(0) === 2L)
    assert(math.abs(s.getDouble(1) - (2.0 / 3 + 0.0) / 2) < 1e-12) // precision
    assert(math.abs(s.getDouble(2) - 2.0 / 3) < 1e-12) // recall, q1 only
    assert(math.abs(s.getDouble(3) - (0.5 + 0.0) / 2) < 1e-12) // MRR
    assert(math.abs(s.getDouble(4) - 0.5) < 1e-12) // hit rate
  }

  test("duplicate truth rows don't inflate hits (relevance is a set)") {
    val dup = truth.union(truth) // every relevance row twice
    val r = RankEval.perQuery(results, dup).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) === ((3L, 3L, 2L, 2L)))
  }

  test("perfect retrieval scores 1.0 across the board") {
    val res = Seq((7L, 1L, 1L), (7L, 2L, 2L)).toDF("qid", "doc_id", "rank")
    val tr = Seq((7L, 1L), (7L, 2L)).toDF("qid", "doc_id")
    val s = RankEval.summary(RankEval.perQuery(res, tr)).head()
    assert(s.getDouble(1) === 1.0 && s.getDouble(2) === 1.0 &&
      s.getDouble(3) === 1.0 && s.getDouble(4) === 1.0)
  }
}
