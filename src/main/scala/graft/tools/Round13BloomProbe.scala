package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 decontamination A/B (BENCH_NOTES): broadcast-join
  * `decontaminate` vs Bloom-prefiltered `decontaminateBloom` at a
  * corpus scale where the gram relation is real — N train docs × ~24
  * tokens against a benchmark whose distinct-gram set is ~100k-1M rows.
  * The Bloom form's claim: the per-executor bytes drop from the full
  * md5-string hash relation (~100 B/gram) to bitsPerGram/8 B/gram
  * (50×), the flagged-gram shuffle is candidate-sized, and the output
  * is row-identical (asserted here on the full result, not sampled).
  *
  * Usage: runMain graft.tools.Round13BloomProbe [trainDocs=1000000]
  *          [benchDocs=20000]
  */
object Round13BloomProbe {
  def main(args: Array[String]): Unit = {
    val nTrain = if (args.length > 0) args(0).toLong else 1000000L
    val nBench = if (args.length > 1) args(1).toLong else 20000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthetic corpus: 24 tokens/doc from a 1k-word vocab; every 37th
    // train doc carries one of the benchmark's 4-gram leaks
    def text(seedCol: org.apache.spark.sql.Column, tag: String) =
      array_join(transform(sequence(lit(1), lit(24)),
        i => concat(lit(tag), pmod(xxhash64(seedCol * 131 + i), lit(1000)))),
        " ")
    val train0 = spark.range(nTrain).select(col("id").as("doc_id"),
        when(col("id") % 37 === 0,
          concat(text(col("id"), "w"), lit(" leak"), (col("id") % 50).cast("string"),
            lit(" aa bb cc")))
        .otherwise(text(col("id"), "w")).as("text"))
      .repartition(cpus.toInt).localCheckpoint()
    val bench0 = spark.range(nBench).select((col("id") + 5000000L).as("doc_id"),
        concat(text(col("id"), "w"), lit(" leak"), (col("id") % 50).cast("string"),
          lit(" aa bb cc")).as("text"))
      .localCheckpoint()
    println(s"[r13bloom] train=${train0.count()} bench=${bench0.count()}")

    def timed(name: String)(body: => Array[(Long, Long)]): Array[(Long, Long)] = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[r13bloom] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.1f s " +
        f"(${r.length} contaminated docs)")
      r
    }
    val base = timed("broadcast-join") {
      graft.pipeline.TrainingData
        .decontaminate(train0, bench0, "doc_id", "text", 4)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val bloom = timed("bloom-prefilter") {
      graft.pipeline.TrainingData
        .decontaminateBloom(train0, bench0, "doc_id", "text", 4)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    require(base.sameElements(bloom),
      s"MISMATCH: ${base.length} vs ${bloom.length} rows")
    println(s"[r13bloom] outputs IDENTICAL (${base.length} rows)")
    spark.stop()
  }
}
