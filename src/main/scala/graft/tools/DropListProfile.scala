package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Dedup

/** Stage timing inside Dedup.dropList at a given sf dir — scratch
  * profiler (candidates vs verification vs connected components). */
object DropListProfile {
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
    for (_ <- 1 to 2) {
      val docs = Tables.documents(spark, sfDir)
      val groups = t("groups-collapse") {
        Dedup.identicalSetGroupsOf(Dedup.hashedSets(docs))
      }
      println(s"  n_groups=${groups.count()} of ${docs.count()} docs")
      val reps = groups.select(col("rep").as("doc_id"), col("hset"), col("sz"))
      val cand = t("band-candidates") {
        Dedup.lshBandCandidates(reps, 90, numHashes = 128, bands = 32,
          salt = 4, oph = true).localCheckpoint()
      }
      println(s"  n_candidates=${cand.count()}")
      val pairs = t("verify") {
        Dedup.verifyCandidates(cand, reps, 90).localCheckpoint()
      }
      println(s"  n_pairs=${pairs.count()}")
      val starEdges = groups.where(size(col("members")) > 1)
        .select(col("rep").as("a_id"), explode(col("members")).as("b_id"))
        .where(col("a_id") =!= col("b_id"))
      val n = t("connected-components") {
        Dedup.connectedComponents(docs.select(col("doc_id")),
          pairs.select("a_id", "b_id").unionByName(starEdges)).count()
      }
      println(s"  n_assigned=$n")
    }
    spark.stop()
  }
}
