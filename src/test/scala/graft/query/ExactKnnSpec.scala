package graft.query

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExactKnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = Seq(
    (1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(0f, 2f)),
    (4L, Seq(3f, 3f)), (5L, Seq(-1f, 0f)))
    .toDF("id", "vec")

  test("topK: ascending squared distance, correct ids") {
    val r = ExactKnn.topK(points, "vec", "id", Seq(0f, 0f), 3).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 5L))
    val dists = r.map(_.getAs[Double]("sq_dist")).toSeq
    assert(dists === Seq(0.0, 1.0, 1.0).sorted)
    assert(dists == dists.sorted)
  }

  test("topK ties broken by id") {
    // ids 2 and 5 are both at distance 1; 2 must precede 5
    val r = ExactKnn.topK(points, "vec", "id", Seq(0f, 0f), 5).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 5L, 3L, 4L))
  }

  test("topKCosine: descending similarity") {
    val r = ExactKnn.topKCosine(points, "vec", "id", Seq(1f, 0f), 2).collect()
    assert(r.head.getLong(0) === 2L) // identical direction
    val sims = r.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("topKIp: descending inner product — norm matters, unlike cosine") {
    // (3,3) has the largest dot with (1,1) even though (1,0) and (0,2)
    // have cosine closer to some directions; MIPS must rank by raw dot
    val r = ExactKnn.topKIp(points, "vec", "id", Seq(1f, 1f), 3).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(4L, 3L, 2L))
    val ips = r.map(_.getAs[Double]("ip")).toSeq
    assert(ips === Seq(6.0, 2.0, 1.0))
  }

  test("rankedIdsIp: dense ranks, ip ties broken by id") {
    val withTie = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(2f, 0f)))
      .toDF("id", "vec")
    // query (1,1): ids 1 and 2 both dot = 1 — rank ties to lower id
    val r = ExactKnn.rankedIdsIp(withTie, "vec", "id", Seq(1f, 1f), 3).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(r.map(_.getLong(1)).toSeq === Seq(3L, 1L, 2L))
  }

  test("batchTopKIp: per-query parity with topKIp") {
    val qids = Seq(1L, 4L, 5L)
    val queries = qids
      .map(i => i -> points.where(col("id") === i)
        .select("vec").head().getSeq[Float](0))
      .toDF("qid", "qvec")
    val batch = ExactKnn.batchTopKIp(points, "vec", "id", queries,
        "qid", "qvec", 3)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    qids.foreach { qid =>
      val qv = points.where(col("id") === qid)
        .select("vec").head().getSeq[Float](0)
      val single = ExactKnn.topKIp(points, "vec", "id", qv, 3)
        .collect().map(r => (r.getLong(0), r.getAs[Double]("ip"))).toSeq
      assert(batch(qid) === single, s"query $qid")
    }
  }

  test("rankedIds: dense integer ranks from 1") {
    val r = ExactKnn.rankedIds(points, "vec", "id", Seq(0f, 0f), 4).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(r.map(_.getLong(1)).toSeq === Seq(1L, 2L, 5L, 3L))
  }

  test("knnClassify: majority label of the k nearest, ties to smallest label") {
    // labels: cluster near origin -> 0, far cluster -> 1
    val labeled = Seq(
      (1L, Seq(0f, 0f), 0L), (2L, Seq(1f, 0f), 0L), (3L, Seq(0f, 1f), 0L),
      (4L, Seq(9f, 9f), 1L), (5L, Seq(10f, 9f), 1L), (6L, Seq(9f, 10f), 1L))
      .toDF("id", "vec", "label")
    val queries = Seq((100L, Seq(0.2f, 0.2f)), (200L, Seq(9.5f, 9.5f)))
      .toDF("qid", "qvec")
    val r = ExactKnn.knnClassify(labeled, "vec", "id", "label",
        queries, "qid", "qvec", k = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(100L) === ((0L, 3L))) // all 3 nearest are label 0
    assert(r(200L) === ((1L, 3L)))
    // tie case: k=2 neighbors of a midpoint split 1-1 -> smaller label wins
    val mid = Seq((300L, Seq(4.75f, 4.75f))).toDF("qid", "qvec")
    val t = ExactKnn.knnClassify(labeled, "vec", "id", "label",
        mid, "qid", "qvec", k = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(t(300L) === ((0L, 1L)))
  }

  test("knnJoin: refuses inputs past the broadcast cap") {
    val e = intercept[IllegalArgumentException] {
      ExactKnn.knnJoin(points, "vec", "id", 2, maxRows = 3)
    }
    assert(e.getMessage.contains("AnnJoin.knnJoin"))
  }

  test("knnJoin guard: knownRows skips the count, MaxValue skips the guard") {
    // a caller-supplied size is TRUSTED (no counting job): an honest
    // over-cap knownRows raises, an under-cap one passes the same data
    // the count-based guard would refuse
    val e = intercept[IllegalArgumentException] {
      ExactKnn.knnJoin(points, "vec", "id", 2, maxRows = 3, knownRows = 4)
    }
    assert(e.getMessage.contains("got 4"))
    val viaKnown = ExactKnn
      .knnJoin(points, "vec", "id", 2, maxRows = 3, knownRows = 3)
      .count()
    // maxRows = MaxValue: guard (and its eager job) skipped entirely
    val viaOptOut = ExactKnn
      .knnJoin(points, "vec", "id", 2, maxRows = Long.MaxValue)
      .count()
    assert(viaKnown === viaOptOut)
  }

  test("batchTopK matches per-query topK for every query") {
    val queries = Seq((10L, Seq(0f, 0f)), (20L, Seq(3f, 3f))).toDF("qid", "qvec")
    val batch = ExactKnn.batchTopK(points, "vec", "id", queries, "qid", "qvec", 3)
      .select("qid", "id", "rank").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq).toMap
    for ((qid, qvec) <- Seq(10L -> Seq(0f, 0f), 20L -> Seq(3f, 3f))) {
      val single = ExactKnn.topK(points, "vec", "id", qvec, 3)
        .collect().map(_.getLong(0)).toSeq
      assert(batch(qid) === single, s"query $qid")
    }
  }

  test("knnJoin: every point's k nearest others, self excluded, " +
      "brute-force checked") {
    val got = ExactKnn.knnJoin(points, "vec", "id", 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val data = Seq(
      1L -> Seq(0f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(0f, 2f),
      4L -> Seq(3f, 3f), 5L -> Seq(-1f, 0f))
    def d2(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val want = data.map { case (qid, qv) =>
      qid -> data.filter(_._1 != qid)
        .map { case (id, v) => (d2(qv, v), id) }
        .sorted.take(2).map(_._2)
    }.toMap
    assert(got === want)
    got.values.foreach(nn => assert(nn.size === 2))
  }
}
