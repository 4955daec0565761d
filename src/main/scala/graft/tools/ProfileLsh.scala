package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Dedup

/** Stage attribution for the MinHash+LSH path at a given sf: signature
  * build vs band-join candidates vs exact verification, plus the full
  * entry (with identical-set collapse) — so the heavy dedup entries can
  * be blamed on a stage. Run:
  * sbt "runMain graft.tools.ProfileLsh [sfDir]". */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir).cache()
    docs.count()

    def time(label: String)(n: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = n
      println(f"STAGE $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows")
    }

    val sets = Dedup.hashedSets(docs).cache()
    time("hashed-sets")(sets.count())
    time("lsh-candidates(t=90)")(
      Dedup.lshBandCandidates(sets, 90, 128, 32, 4, oph = true).count())
    // collapsed-path stage attribution: reps, band join over reps only,
    // verified rep pairs
    val groups = Dedup.identicalSetGroupsOf(sets)
    time("identical-groups")(groups.count())
    val reps = groups.select(col("rep").as("doc_id"), col("hset"), col("sz"))
      .cache()
    time("reps")(reps.count())
    // bucket shape: how many joined rows does the band self-join produce
    // (Σ g·(g−1)/2 over band buckets) and how big is the largest bucket?
    import graft.functions.FastFunctions.{bandKeys, minhashSigOPH}
    val bandRows = reps.select(col("doc_id"),
      posexplode(bandKeys(minhashSigOPH(col("hset"), 128), 32))
        .as(Seq("b", "k")))
    val buckets = bandRows.groupBy("b", "k").agg(count(lit(1)).as("g"))
    val shape = buckets.agg(
      sum(col("g") * (col("g") - 1) / 2).as("joined_rows"),
      max(col("g")).as("max_bucket"),
      count(lit(1)).as("n_buckets")).collect()(0)
    println(s"SHAPE joined_rows=${shape.get(0)} max_bucket=${shape.get(1)} n_buckets=${shape.get(2)}")
    // distinct full signatures among reps (sig-identical collapse headroom)
    val nSigs = reps.select(minhashSigOPH(col("hset"), 128).as("sig"))
      .select(xxhash64(col("sig")).as("h")).distinct().count()
    println(s"SHAPE distinct_sigs=$nSigs of ${reps.count()}")
    val repCand = Dedup.lshBandCandidates(reps, 90, 128, 32, 4, oph = true)
    time("rep-candidates")(repCand.count())
    time("rep-cand+verify")(Dedup.minHashLshPairsOn(reps, 90, 128, 32, 4, oph = true).count())
    time("full-entry run1")(Dedup.minHashLshPairs(docs, 90).count())
    time("full-entry run2")(Dedup.minHashLshPairs(docs, 90).count())

    // pair-set equality vs the exact PPJoin relation (the LSH geometry's
    // zero-miss check on this corpus)
    val lsh = Dedup.minHashLshPairs(docs, 90).select("a_id", "b_id")
    val exact = Dedup.jaccardPairs(docs, 90).select("a_id", "b_id")
    println(s"DIFF lsh-minus-exact=${lsh.exceptAll(exact).count()} exact-minus-lsh=${exact.exceptAll(lsh).count()}")
    spark.stop()
  }
}
