package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mmr.rerank: greedy walk, diversity penalty, tie-break, missing
  * sims, short groups. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(cands: Seq[(Long, Long, Long)],
                  sims: Seq[(Long, Long, Long, Long)],
                  k: Int, lambda: Long) =
    Mmr.rerank(cands.toDF("qid", "cid", "rel"),
        sims.toDF("qid", "a", "b", "sim"), k, lambda)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("pure relevance (λ = 1e6) reproduces the rel order with id " +
      "tie-break") {
    val got = run(Seq((0L, 10L, 5L), (0L, 11L, 9L), (0L, 12L, 5L)),
      Seq((0L, 10L, 11L, 100L)), k = 3, lambda = 1000000L)
    assert(got === Seq((0L, 1L, 11L), (0L, 2L, 10L), (0L, 3L, 12L)))
  }

  test("the diversity penalty demotes a near-duplicate of the first " +
      "pick below a fresh candidate") {
    // rel: 20, 19, 15; cid 2 is a near-dup of cid 1 (sim 50);
    // λ=0.5: round 2 scores — dup: 0.5·19 − 0.5·50 < fresh: 0.5·15
    val got = run(
      Seq((7L, 1L, 20L), (7L, 2L, 19L), (7L, 3L, 15L)),
      Seq((7L, 1L, 2L, 50L)), k = 3, lambda = 500000L)
    assert(got === Seq((7L, 1L, 1L), (7L, 2L, 3L), (7L, 3L, 2L)))
    // sims apply in either orientation
    val rev = run(
      Seq((7L, 1L, 20L), (7L, 2L, 19L), (7L, 3L, 15L)),
      Seq((7L, 2L, 1L, 50L)), k = 3, lambda = 500000L)
    assert(rev === got)
  }

  test("missing similarity pairs count as zero; short groups stop " +
      "early; queries rerank independently") {
    val got = run(
      Seq((1L, 5L, 3L), (1L, 6L, 2L), (2L, 9L, 1L)),
      Seq.empty, k = 5, lambda = 700000L)
    assert(got === Seq((1L, 1L, 5L), (1L, 2L, 6L), (2L, 1L, 9L)))
  }

  test("the penalty is the MAX over selected, not the sum") {
    // cid 3 has sim 10 to BOTH picks; cid 4 has sim 18 to one.
    // max-penalty: 3 scores −10·μ beats 4's −18·μ at equal rel
    val got = run(
      Seq((0L, 1L, 100L), (0L, 2L, 90L), (0L, 3L, 50L), (0L, 4L, 50L)),
      Seq((0L, 1L, 3L, 10L), (0L, 2L, 3L, 10L), (0L, 1L, 4L, 18L)),
      k = 3, lambda = 500000L)
    assert(got(2) === ((0L, 3L, 3L)))
  }
}
