package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.pipeline.Dedup

/** A/B of auto vs pinned LSH candidate strategy on the sf fixture. */
object LshAutoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s n=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    val dec = Dedup.lshEmitOnceAuto(
      Dedup.identicalSetGroupsOf(Dedup.hashedSets(docs))
        .select(org.apache.spark.sql.functions.col("rep").as("doc_id"),
          org.apache.spark.sql.functions.col("hset"),
          org.apache.spark.sql.functions.col("sz")), 128, 32, oph = true)
    println(s"  auto decision on reps: emitOnce=$dec")
    for (_ <- 1 to 3) {
      t("pinned Some(true)")(
        Dedup.minHashLshPairs(docs, 90, emitOnce = Some(true)).count())
      t("auto None       ")(
        Dedup.minHashLshPairs(docs, 90).count())
    }
    spark.stop()
  }
}
