package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Dedup, TextAnalysis}

/** Stage-by-stage timing of the CorpusClean composite — scratch profiler
  * for attributing the corpus_clean entry's wall-clock. */
object CleanProfile {
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
      val sig = t("sig-checkpoint") {
        TextAnalysis.withQualitySignals(docs)
          .withColumn("low_q", col("n_tokens") < 16 || col("stop_pct") > 12)
          .localCheckpoint()
      }
      val qualityDocs = sig.where(!col("low_q"))
        .select(docs.columns.map(col).toIndexedSeq: _*)
      val exact = t("exact-checkpoint") {
        Dedup.exactDuplicates(qualityDocs)
          .select(col("doc_id"), lit("exact_dup").as("reason"))
          .localCheckpoint()
      }
      val uniqueDocs = t("unique-checkpoint") {
        qualityDocs.join(exact.select("doc_id"), Seq("doc_id"), "left_anti")
          .localCheckpoint()
      }
      val n = t("dropList-count") {
        Dedup.dropList(uniqueDocs, 90).count()
      }
      println(s"  near rows: $n")
    }
    spark.stop()
  }
}
