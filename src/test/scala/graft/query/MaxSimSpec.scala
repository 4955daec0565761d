package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** MaxSim late-interaction scoring vs a hand-computed / brute-force
  * oracle on small multi-vector fixtures. */
class MaxSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("score: per-query-token max, then sum (hand-computed)") {
    // query 1 tokens: a=(1,0), b=(0,1)
    // doc 10 tokens: (2,0), (0,3)  -> max for a = 2, for b = 3 -> 5
    // doc 20 tokens: (1,1)         -> max for a = 1, for b = 1 -> 2
    val q = Seq((1L, 0, Seq(1.0, 0.0)), (1L, 1, Seq(0.0, 1.0)))
      .toDF("qid", "qpos", "qvec")
    val d = Seq(
      (10L, 0, Seq(2.0, 0.0)), (10L, 1, Seq(0.0, 3.0)),
      (20L, 0, Seq(1.0, 1.0))).toDF("doc_id", "dpos", "dvec")
    val cand = Seq((1L, 10L), (1L, 20L)).toDF("qid", "doc_id")
    val got = MaxSim.score(q, d, cand)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 10L, 5.0), (1L, 20L, 2.0)))
  }

  test("score: duplicated candidates do not double-score") {
    val q = Seq((1L, 0, Seq(1.0))).toDF("qid", "qpos", "qvec")
    val d = Seq((10L, 0, Seq(4.0))).toDF("doc_id", "dpos", "dvec")
    val cand = Seq((1L, 10L), (1L, 10L)).toDF("qid", "doc_id")
    val got = MaxSim.score(q, d, cand).collect()
    assert(got.length === 1)
    assert(got.head.getDouble(2) === 4.0)
  }

  test("topK: brute-force parity and deterministic tie ranking") {
    val rnd = new scala.util.Random(11)
    val dim = 4
    def vec(): Seq[Double] = Seq.fill(dim)((rnd.nextInt(7) - 3).toDouble)
    val qs = for (qid <- 0L until 3L; p <- 0 until 3)
      yield (qid, p, vec())
    val ds = for (did <- 100L until 120L; p <- 0 until 4)
      yield (did, p, vec())
    val q = qs.toDF("qid", "qpos", "qvec")
    val d = ds.toDF("doc_id", "dpos", "dvec")
    val cand = (for (qid <- 0L until 3L; did <- 100L until 120L)
      yield (qid, did)).toDF("qid", "doc_id")
    val got = MaxSim.topK(q, d, cand, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    // brute force
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val want = (for (qid <- 0L until 3L) yield {
      val scored = (100L until 120L).map { did =>
        val s = qs.filter(_._1 == qid).map { case (_, _, qv) =>
          ds.filter(_._1 == did).map(t => dot(qv, t._3)).max
        }.sum
        (did, s)
      }.sortBy { case (did, s) => (-s, did) }.take(5)
      qid -> scored
    }).toMap
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(byRank === want(qid).toSeq, s"qid=$qid")
    }
    assert(got.length === 15)
  }
}
