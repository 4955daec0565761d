package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.index.{IvfPqBuilder, IvfPqConfig}

/** Stage-timing probe for the IVF+PQ fit at a given sf dir — prints the
  * builder's BuildEvent log so hot stages are visible. */
object FitProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir).cache()
    println(s"rows=${emb.count()}")
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val (_, encoded) = IvfPqBuilder.fit(emb, "vec_id", "embedding", 64,
        IvfPqConfig(numPartitions = 8, numDivisions = 16, numCodes = 64,
          maxIter = 20),
        s => println(s"[fit$round] $s"))
      encoded.count()
      println(f"[fit$round] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
