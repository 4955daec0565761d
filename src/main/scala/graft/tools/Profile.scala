package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc stage profiler: times named sub-plans. Run:
  * sbt "runMain graft.tools.Profile <sfDir>". */
object Profile {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft._
    import graft.pipeline._
    val docs = Tables.documents(spark, dir).cache()
    docs.count()

    time("hashedSets")(Dedup.hashedSets(docs))
    time("jaccardPairs-full")(Dedup.jaccardPairs(docs, 85))
    time("minhash-sigs")(Dedup.minHashSignatures(docs, 128))
    time("lsh-candidates")(
      Dedup.lshCandidates(Dedup.minHashSignatures(docs, 128), 32))
    time("minhash-lsh-full")(Dedup.minHashLshPairs(docs, 90))
    time("simhash-sigs")(Dedup.simHashSignatures(docs))
    time("simhash-verified")(Dedup.simHashDupPairsVerified(docs))
    val emb = Tables.embeddings(spark, dir).cache()
    emb.count()
    time("embed-neardup")(Dedup.embeddingNearDupPairs(emb, 400))
    val q = Tables.embeddings(spark, dir)
      .where(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    time("knn-exact")(graft.query.ExactKnn.rankedIds(emb, "embedding", "vec_id", q, 10))
    spark.stop()
  }
}
