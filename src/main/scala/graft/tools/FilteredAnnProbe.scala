package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.{AnnQuery, ExactKnn}

/** Calibration: filtered-ANN recall vs exact filtered k-NN (label = 3)
  * at the shared-fixture index geometry, per sf dir. */
object FilteredAnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, dir).cache()
      emb.count()
      val (model, encoded) = IvfPqBuilder.fit(emb, "vec_id", "embedding", 64,
        IvfPqConfig(numPartitions = 8, numDivisions = 16, numCodes = 256,
          maxIter = 20))
      val withLabel = encoded
        .join(emb.select(col("vec_id").as("id"), col("label")), "id")
        .cache()
      withLabel.count()
      val qf = emb.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toArray
      val exact = ExactKnn
        .rankedIds(emb.where(col("label") === 3), "embedding", "vec_id", qf, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      for (np <- Seq(4, 8)) {
        val hits = AnnQuery.topK(withLabel.where(col("label") === 3), model,
            qf.map(_.toDouble), 10, np)
          .select("id").collect().map(_.getLong(0)).toSet
        println(s"$dir nprobe=$np n=${hits.size} " +
          s"recall=${exact.intersect(hits).size}/10")
      }
      // pre-filter + ADC nominate + exact re-rank (the production
      // filtered-ANN shape): ADC ranking error collapses to candidate error
      for (np <- Seq(4, 8); kf <- Seq(3, 4)) {
        val hits = AnnQuery.topKRerank(
            withLabel.where(col("label") === 3).select("id", "partition", "codes"),
            emb.where(col("label") === 3), "embedding", "vec_id",
            model, qf.map(_.toDouble), 10, np, kFactor = kf)
          .select("id").collect().map(_.getLong(0)).toSet
        println(s"$dir RERANK nprobe=$np kFactor=$kf n=${hits.size} " +
          s"recall=${exact.intersect(hits).size}/10")
      }
      emb.unpersist(); withLabel.unpersist()
    }
    spark.stop()
  }
}
