package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Dedup
import graft.functions.FastFunctions.hashedShingleSet

/** Stage attribution for the PPJoin shingled-Jaccard path: shingling vs
  * candidate generation vs verification, so a slow bench entry can be
  * blamed on a stage instead of guessed at.
  * Run: sbt "runMain graft.tools.ProfileShingled [sfDir]". */
object ProfileShingled {
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
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows")
    }

    val sets = docs
      .select(col("doc_id"), hashedShingleSet(col("text"), 3).as("hset"))
      .withColumn("sz", size(col("hset")).cast("long"))
      .where(col("sz") > 0)
    time("shingle-sets")(sets.count())
    val cached = sets.cache()
    cached.count()

    // fan-out attribution: prefix relation size and Σ df² over prefix
    // tokens (= raw joined rows before the doc< and filter conjuncts)
    val toks = cached.select(col("doc_id"), col("sz"),
      explode(col("hset")).as("h"))
    time("exploded-tokens")(toks.count())
    val dfreq = toks.groupBy("h").agg(count(lit(1)).as("df"))
    val prefixed = toks.join(dfreq, "h")
      .groupBy(col("doc_id"), col("sz"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ranked"))
      .select(col("doc_id"), col("sz"),
        slice(col("ranked"), lit(1),
          (col("sz") - floor((col("sz") * 60 + 99) / 100) + 1).cast("int"))
          .as("prefix"))
    time("prefix-rows")(prefixed.select(posexplode(col("prefix"))).count())
    time("sum-df2-prefix")(
      prefixed.select(explode(col("prefix")).as("s"))
        .select(col("s.h").as("h"))
        .groupBy("h").agg(count(lit(1)).as("pdf"))
        .agg(sum(col("pdf") * col("pdf"))).collect()(0).getLong(0))
    time("candidates(t=60)")(Dedup.ppjoinCandidates(cached, 60).count())
    time("cand+verify(t=60)")(Dedup.jaccardPairsOn(cached, 60).count())
    time("full-entry run1")(Dedup.jaccardPairsShingled(docs, 60, 3).count())
    time("full-entry run2")(Dedup.jaccardPairsShingled(docs, 60, 3).count())
    spark.stop()
  }
}
