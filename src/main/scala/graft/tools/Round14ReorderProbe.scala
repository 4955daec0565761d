package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingPipeline

/** Round-14 reorder pre-stage probe (verdict r13 #7): the bounded-delay
  * reorder buffer in front of [[StreamingPipeline.processBatch]] used to
  * rank the held ∪ batch pool in ONE window partition — bounded by the
  * trigger size by contract, but the pipeline's only single-task stage.
  * This probe measures that ceiling against the round-14 threshold form
  * (TakeOrderedAndProject top-w → broadcast min → comparison split) at
  * growing trigger sizes, w = 1024, shuffled ids.
  *
  * Usage: runMain graft.tools.Round14ReorderProbe [sizes=100000,1000000,4000000]
  */
object Round14ReorderProbe {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0) else "100000,1000000,4000000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val w = 1024

    // the replaced form, kept here for the A/B
    def rankedForm(pool: DataFrame): (DataFrame, DataFrame) = {
      val ranked = pool.withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("doc_id").desc)))
      (ranked.where(col("__rn") > w).drop("__rn"),
        ranked.where(col("__rn") <= w).drop("__rn"))
    }

    for (n <- sizes) {
      // shuffled ids with payload text — a realistic trigger relation
      val batch = spark.range(n.toLong)
        .select(xxhash64(col("id")).as("shuffle_key"), col("id"))
        .orderBy("shuffle_key")
        .select(col("id").as("doc_id"),
          concat(lit("document body "), col("id")).as("text"))
        .localCheckpoint()
      val held = StreamingPipeline.emptyHeldState(batch)

      def time(label: String)(body: => (DataFrame, DataFrame)): Unit = {
        // warm once then measure twice, keep the best (JIT/plan cache)
        var best = Double.MaxValue
        var counts = (0L, 0L)
        for (_ <- 0 until 3) {
          val t0 = System.nanoTime()
          val (rel, hld) = body
          counts = (rel.count(), hld.count())
          val s = (System.nanoTime() - t0) / 1e9
          if (s < best) best = s
        }
        println(f"[r14reorder] n=$n%8d $label%-10s ${best}%7.3f s " +
          f"released=${counts._1} held=${counts._2}")
      }
      time("ranked")(rankedForm(held.unionByName(batch)))
      time("threshold")(StreamingPipeline.reorderBatch(batch, held, w))
    }
    spark.stop()
  }
}
