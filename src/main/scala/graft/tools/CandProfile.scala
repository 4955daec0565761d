package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Dedup

/** A/B of candidate generators at high threshold on the rep relation. */
object CandProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  stage $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    val groups = Dedup.identicalSetGroupsOf(Dedup.hashedSets(docs))
    val reps = groups.select(col("rep").as("doc_id"), col("hset"), col("sz"))
      .localCheckpoint()
    println(s"  n_reps=${reps.count()}")
    for (_ <- 1 to 2) {
      val lsh = t("lsh-candidates") {
        Dedup.lshBandCandidates(reps, 90, 128, 32, 4, oph = true).count()
      }
      val pp = t("ppjoin-candidates") {
        Dedup.ppjoinCandidates(reps, 90).count()
      }
      val ppv = t("ppjoin-full") {
        Dedup.jaccardPairsOn(reps, 90).count()
      }
      println(s"  lsh=$lsh ppjoin=$pp verified=$ppv")
    }
    spark.stop()
  }
}
