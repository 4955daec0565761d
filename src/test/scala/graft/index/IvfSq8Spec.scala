package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.query.ExactKnn

/** IVF+SQ8 composite: recall on clustered data, probe confinement,
  * asymmetric distances vs a decode-side recompute, nprobe=P exactness
  * up to codec error. */
class IvfSq8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(29)
    Seq.tabulate(240) { i =>
      val c = i % 4
      (i.toLong, Seq.tabulate(dim)(j =>
        (math.sin(c * 2.1 + j) * 8 + rnd.nextGaussian() * 0.4).toFloat))
    }
  }
  private lazy val df = data.toDF("id", "vec")
  private lazy val fitRes = IvfSq8.fit(df, "id", "vec", dim,
    numPartitions = 4, seed = 5L)
  private lazy val model = fitRes._1
  private lazy val enc = fitRes._2.cache()

  test("hits stay inside the probed cells; exactly k rows ascending") {
    val q = data(17)._2.map(_.toDouble).toArray
    val probes = IvfSq8.selectPartitions(model, q, 2).map(_._1).toSet
    val hits = IvfSq8.topK(enc, model, q, 10, nprobe = 2).collect()
    assert(hits.length === 10)
    assert(hits.forall(r => probes.contains(r.getInt(1))))
    val d = hits.map(_.getDouble(2)).toSeq
    assert(d === d.sorted)
  }

  test("high recall on clustered data at nprobe 2 of 4") {
    val q = data(33)._2.map(_.toDouble).toArray
    val hits = IvfSq8.topK(enc, model, q, 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    val exact = ExactKnn.rankedIds(df, "vec", "id", data(33)._2, 10)
      .collect().map(_.getLong(1)).toSeq
    assert(hits.toSet.intersect(exact.toSet).size >= 8,
      s"ivfsq8=$hits exact=$exact")
  }

  test("distances equal a decode-side recompute through the HOF path") {
    val q = data(3)._2.map(_.toDouble).toArray
    val qLit = typedlit(q.toSeq)
    val centLit = typedlit(model.partitionCentroids.map(_.toSeq).toSeq)
    val bad = IvfSq8.topK(enc, model, q, 10, nprobe = 4)
      .join(Sq8.decoded(model.codec, enc.select("id", "sq8")), "id")
      .withColumn("approx", zip_with(col("decoded"),
        element_at(centLit, col("partition") + 1), (r, c) => r + c))
      .withColumn("rec", aggregate(zip_with(col("approx"), qLit,
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
      .where(abs(col("sq_dist") - col("rec")) > 1e-9)
      .count()
    assert(bad === 0L)
  }

  test("nprobe = P recovers the exact top-1 (codec error ≪ cluster gap)") {
    val q = data(100)._2.map(_.toDouble).toArray
    val top = IvfSq8.topK(enc, model, q, 1, nprobe = 4)
      .collect().head.getLong(0)
    assert(top === 100L) // the query vector finds itself
  }
}
