package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EmbeddingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val data = Seq(
    (1L, 0, Seq(1.0f, 2.0f, 3.0f)),
    (2L, 0, Seq(3.0f, 4.0f, 5.0f)),
    (3L, 1, Seq(10.0f, 10.0f, 10.0f)))
    .toDF("vec_id", "label", "embedding")

  test("centroids: per-group mean vector in position order") {
    val r = Embeddings.centroids(data, "label", "embedding")
      .orderBy("label").collect()
      .map(x => (x.getInt(0), x.getSeq[Double](1).toSeq, x.getLong(2)))
    assert(r.toSeq === Seq(
      (0, Seq(2.0, 3.0, 4.0), 2L),
      (1, Seq(10.0, 10.0, 10.0), 1L)))
  }

  test("centroidSumsMilli: integer-exact partial sums") {
    val r = Embeddings.centroidSumsMilli(data, "label", "embedding")
      .orderBy("label", "pos").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq(
      (0, 0L, 4000L, 2L), (0, 1L, 6000L, 2L), (0, 2L, 8000L, 2L),
      (1, 0L, 10000L, 1L), (1, 1L, 10000L, 1L), (1, 2L, 10000L, 1L)))
  }

  test("filtered k-NN: the attribute predicate reaches the parquet scan") {
    // write a small parquet table, filter + top-k, inspect the scan
    val dir = java.nio.file.Files.createTempDirectory("knnf").toString
    try {
      data.write.mode("overwrite").parquet(dir)
      val emb = spark.read.parquet(dir)
      val plan = graft.query.ExactKnn
        .rankedIds(emb.where(col("label") === 1), "embedding", "vec_id",
          Array(1f, 1f, 1f), 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,1)]"),
        s"filter not pushed:\n$plan")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
