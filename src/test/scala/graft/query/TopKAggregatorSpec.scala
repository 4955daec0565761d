package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Direct property coverage for the bounded top-k aggregate — the
  * binary-insert buffer must agree with a brute-force sort on every
  * draw, including tied distances, duplicate (dist, id) rows, groups
  * smaller than k, and merges across many partitions (reduce handles
  * within-partition order, merge handles partial buffers). */
class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteTopK(rows: Seq[(Long, Double, Long)], k: Int)
      : Map[Long, Seq[(Double, Long)]] =
    rows.groupBy(_._1).view.mapValues(
      _.map(r => (r._2, r._3)).sortBy(identity).take(k).toSeq).toMap

  private def aggTopK(rows: Seq[(Long, Double, Long)], k: Int,
                      parts: Int): Map[Long, Seq[(Double, Long)]] = {
    import org.apache.spark.sql.functions._
    rows.toDF("qid", "dist", "id").repartition(parts)
      .groupBy("qid")
      .agg(TopKAggregator.topK(k)(col("dist"), col("id")).as("hits"))
      .select(col("qid"), explode(col("hits")).as("hit"))
      .select(col("qid"), col("hit.dist"), col("hit.id"))
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getDouble(1), r.getLong(2))).toSeq).toMap
  }

  test("random draws with heavy ties equal brute force, any partitioning") {
    val rnd = new scala.util.Random(42)
    // quantized distances force many exact ties; ids tie-break
    val rows = Seq.tabulate(2000) { i =>
      (rnd.nextInt(7).toLong, (rnd.nextInt(12) / 4.0), i.toLong)
    }
    for (k <- Seq(1, 3, 10); parts <- Seq(1, 13)) {
      assert(aggTopK(rows, k, parts) === bruteTopK(rows, k),
        s"k=$k parts=$parts")
    }
  }

  test("duplicate (dist, id) rows and groups smaller than k") {
    val rows = Seq(
      (1L, 0.5, 10L), (1L, 0.5, 10L), (1L, 0.5, 9L), // exact duplicates
      (2L, 1.0, 1L) // group of 1 with k = 5
    )
    val got = aggTopK(rows, 5, 3)
    assert(got(1L) === Seq((0.5, 9L), (0.5, 10L), (0.5, 10L)))
    assert(got(2L) === Seq((1.0, 1L)))
  }

  test("ascending output, worst candidate evicted at the boundary") {
    // exactly k+1 candidates: the single worst one must be the one cut
    val rows = (0 until 6).map(i => (7L, i.toDouble, (100 - i).toLong))
    val got = aggTopK(rows, 5, 2)(7L)
    assert(got === Seq((0.0, 100L), (1.0, 99L), (2.0, 98L),
      (3.0, 97L), (4.0, 96L)))
  }
}
