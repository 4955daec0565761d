package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Run named SparkEntry queries against one sf dir and print the rows —
  * the fast inner loop for iterating on a single entry without the full
  * Verify + DuckDB gate. Usage: EntryProbe <sfDir> <entry> [<entry>…] */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576") // bounded top-k states are k*16 B; the 128-key default
                   // silently degrades batch k-NN to sort-based partials
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      // timed section = the Bench count path, so a probe reading is
      // comparable to the suite's per-entry record. (The old probe
      // timed a full collect(), which bills driver-side serialization
      // of the whole result to the entry — on a ~1M-row result that
      // read 4× the entry's actual cost and caused the r7
      // dedup_minhash_lsh "drift".) The head rows are fetched OUTSIDE
      // the timing via limit(), which never materializes the result.
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val head = df.limit(3).collect()
      println(f"entry $name @ $sfDir [$sec%.1f s] n=$n " +
        s"head=${head.mkString(" | ")}")
      // SPARK_GRAFT_EXPLAIN=1 prints the executed plan after the run
      // (post-AQE, so what actually executed)
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
