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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val rows = df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"entry $name @ $sfDir [$sec%.1f s] n=${rows.length} " +
        s"head=${rows.take(3).mkString(" | ")}")
      // SPARK_GRAFT_EXPLAIN=1 prints the executed plan after the run
      // (post-AQE, so what actually executed)
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
