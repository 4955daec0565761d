package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Stage split of the 10M-doc MinHash+LSH probe: hashed sets, the
  * band-join candidate stage, and exact verification timed apart, so
  * the 10M cost attributes to a stage instead of a total. */
object LshStageProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    // the TextScaleProbe 10M fixture: every 100th doc near-dups its
    // predecessor (one substitution at j=0)
    val mixed = spark.range(n).repartition(64)
      .select(col("id").as("doc_id"),
        expr("concat_ws(' ', transform(sequence(0, 49), " +
          "j -> concat('w', cast(hash(id - CASE WHEN id % 100 = 0 " +
          "THEN 1 ELSE 0 END, j) + " +
          "CASE WHEN id % 100 = 0 AND j = 0 THEN 1 ELSE 0 END " +
          "as string))))").as("text"))
    val sets = timed("hashed-sets-materialize")(
      Dedup.hashedSets(mixed).localCheckpoint())
    println("sets: " + sets.count())
    val emit = timed("strategy-auto")(
      Dedup.lshEmitOnceAuto(sets, 128, 32, oph = true))
    println("emitOnce=" + emit)
    val cand = timed("band-candidates")(
      Dedup.lshBandCandidates(sets, 80, 128, 32, salt = 1, oph = true,
        emitOnce = emit).localCheckpoint())
    println("candidates: " + cand.count())
    timed("verify")(
      Dedup.verifyCandidates(cand, sets, 80).count())
    spark.stop()
  }
}
