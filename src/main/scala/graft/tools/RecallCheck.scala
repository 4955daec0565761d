package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.{AnnQuery, ExactKnn}

/** Calibration tool: per-query ANN recall vs exact k-NN across index
  * configs, to size the invariant-oracle bounds defensibly. */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir).cache()
    emb.count()
    val queries = emb.where(col("vec_id") <= 4)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    for ((p, dd, c, np) <- Seq((8, 8, 16, 4), (8, 8, 16, 8), (8, 16, 16, 4),
                               (8, 8, 64, 4), (8, 16, 64, 4))) {
      val (model, encoded) = IvfPqBuilder.fit(emb, "vec_id", "embedding", 64,
        IvfPqConfig(numPartitions = p, numDivisions = dd, numCodes = c,
          maxIter = 20))
      encoded.cache().count()
      val recalls = queries.map { case (qid, qf) =>
        val exact = ExactKnn.topK(emb, "embedding", "vec_id", qf, 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val ann = AnnQuery.topK(encoded, model, qf.map(_.toDouble), 10, np)
          .select("id").collect().map(_.getLong(0)).toSet
        (qid, exact.intersect(ann).size)
      }
      println(s"CONFIG P=$p D=$dd C=$c nprobe=$np -> " +
        recalls.map { case (q, r) => s"q$q:$r" }.mkString(" "))
      encoded.unpersist()
    }
    spark.stop()
  }
}
