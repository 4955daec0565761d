package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Graph, PageRank}
import graft.streaming.EventPipeline

/** Scale canary for the graph family: synthesizes a deterministic
  * skewed random graph (endpoints drawn with a quadratic-skew inverse
  * transform over hash randomness — hub-heavy like a real link graph,
  * fully in-plan, rerun-stable) and times triangle counting, HITS and
  * PageRank at 1M–10M edges, plus the ingest-anomaly monitor over a
  * synthetic 100M-event stream. Recorded in BENCH_NOTES.md; rerun ad
  * hoc, not part of the per-round bench.
  *
  * Usage: runMain graft.tools.GraphScaleProbe [nEdges=1000000] [filter]
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val filter = if (args.length > 1)
      args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // quadratic-skew endpoints over V = n/5 nodes: u² maps hash-uniform
    // [0,1) randomness to a hub-heavy degree profile (top node gathers
    // ~sqrt-scale degree) — the shape that punishes a naive wedge join
    val v = math.max(n / 5, 100L)
    def end(seed: Int): String =
      s"cast(pow((hash(id, $seed) & 2147483647) / 2147483648.0, 2) * $v " +
        "as long)"
    val edges = spark.range(n).repartition(64)
      .select(expr(end(1)).as("src"), expr(end(2)).as("dst"))
      .where(col("src") =!= col("dst"))
      .localCheckpoint()

    def timed(name: String)(f: => Long): Unit =
      if (filter.isEmpty || filter.exists(name.contains)) {
        val t0 = System.nanoTime()
        val rows = f
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
      }

    timed(s"triangles over $n skewed edges") {
      val t = Graph.triangles(edges)
      val r = t.agg(sum(col("tri")).as("t"), count(lit(1)).as("n"))
        .collect()(0)
      println(s"  total per-node tri = ${r.getLong(0)} over " +
        s"${r.getLong(1)} nodes")
      r.getLong(1)
    }
    timed(s"hits 2 iters over $n skewed edges") {
      Graph.hits(edges, iters = 2).count()
    }
    timed(s"pagerank 3 iters over $n skewed edges") {
      PageRank.rankKeyed(edges, iters = 3).count()
    }
    timed(s"label_prop 2 rounds over $n skewed edges (1k seeds)") {
      val seeds = spark.range(1000)
        .select(col("id").as("v"), expr("id % 5").as("lbl"))
      Graph.labelProp(edges, seeds, iters = 2).count()
    }
    timed(s"kcore_peel k=8 x3 rounds over $n skewed edges") {
      Graph.kcorePeel(edges, k = 8, rounds = 3).count()
    }
    timed("daily_anomalies over 100M synthetic events") {
      val ev = spark.range(100000000L).repartition(64)
        .select((col("id") * 86400000L).as("ts"), // 1M events/day, 100 days
          expr("concat('t', cast(id % 8 as string))").as("event_type"))
      EventPipeline.dailyAnomalies(ev, "ts", "event_type").count()
    }
    spark.stop()
  }
}
