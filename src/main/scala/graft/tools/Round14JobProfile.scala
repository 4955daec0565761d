package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-JOB profile of one SparkEntry under the exact Bench conditions
  * (warm fixtures, warm JIT — two untimed runs first): prints every
  * Spark job the timed run launches with its wall duration and call
  * site, plus the driver-side gaps (time between jobs = local work:
  * collects already counted, model fits, file IO, planning).
  * Usage: Round14JobProfile <sfDir> <entry> [<entry>…] */
object Round14JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.warmFixtures(spark, sfDir)

    final case class Job(id: Int, desc: String, t0: Long, var t1: Long)
    val jobs = mutable.ArrayBuffer.empty[Job]
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val d = s.stageInfos.lastOption.map(_.name).getOrElse("?") +
            " tasks=" + s.stageInfos.map(_.numTasks).sum
          jobs += Job(s.jobId, d, System.nanoTime(), -1L)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.t1 = System.nanoTime())
        }
    }

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm 1
      fn(spark, sfDir).count() // warm 2
      System.gc()
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val snap = jobs.synchronized(jobs.toVector.sortBy(_.t0))
      println(f"== $name [$sec%.2f s] n=$n jobs=${snap.size}")
      var lastEnd = t0
      for (j <- snap) {
        val gap = (j.t0 - lastEnd) / 1e9
        val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
        println(f"   gap=$gap%6.3f  job=$dur%6.3f  ${j.desc}")
        lastEnd = math.max(lastEnd, if (j.t1 > 0) j.t1 else j.t0)
      }
      println(f"   tail-gap=${(System.nanoTime() - lastEnd) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
