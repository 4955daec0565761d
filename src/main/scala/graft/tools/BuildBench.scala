package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.pseudoRandomVec
import graft.index.{IvfPqBuilder, IvfPqConfig}

/** Apples-to-apples replica of the reference's published build benchmark
  * (reference/README.md:107-140): M pseudo-random f32 vectors of dim N,
  * IVF+PQ build at P partitions / D divisions / C codes. The reference
  * builds 100k×1536 @ P=100 D=12 C=256 in 906.52 s single-threaded; this
  * main times data prep and build on local[32].
  *
  * Usage: runMain graft.tools.BuildBench [M] [dim] [P] [D] [C] [maxIter]
  */
object BuildBench {
  def main(args: Array[String]): Unit = {
    val m = if (args.length > 0) args(0).toInt else 100000
    val dim = if (args.length > 1) args(1).toInt else 1536
    val p = if (args.length > 2) args(2).toInt else 100
    val d = if (args.length > 3) args(3).toInt else 12
    val c = if (args.length > 4) args(4).toInt else 256
    val maxIter = if (args.length > 5) args(5).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "48g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    // localCheckpoint, not cache(): the fit scans this relation twice
    // (sample collect + residual pass), and raw checkpointed rows read
    // ~3x faster than the columnar cache for wide float arrays (the
    // per-element column-accessor cost dominates the scan)
    val vectors = spark.range(m.toLong)
      .repartition(cpus.toInt * 2)
      .select(col("id"), pseudoRandomVec(col("id"), dim, 42L).as("vec"))
      .localCheckpoint()
    val tPrep = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val (model, encoded) = IvfPqBuilder.fit(vectors, "id", "vec", dim,
      IvfPqConfig(numPartitions = p, numDivisions = d, numCodes = c,
        maxIter = maxIter), s => println(s"[buildbench]   $s"))
    val n = encoded.count()
    val tBuild = (System.nanoTime() - t1) / 1e9
    println(f"[buildbench] M=$m dim=$dim P=$p D=$d C=$c maxIter=$maxIter " +
      f"prep=$tPrep%.2f s build=$tBuild%.2f s rows=$n " +
      f"(reference: 906.52 s single-threaded at 100k x 1536)")
    // SPARK_GRAFT_REFINE=1 also times the Rq second-layer fit+encode
    // over the fresh build (D2 = D, C2 = C)
    if (sys.env.get("SPARK_GRAFT_REFINE").contains("1")) {
      val t2 = System.nanoTime()
      val (_, enc2) = graft.index.Rq.fitRefine(encoded, model,
        numDivisions2 = d, numCodes2 = c, maxIter = maxIter)
      val n2 = enc2.count()
      println(f"[buildbench] rq refine D2=$d C2=$c " +
        f"${(System.nanoTime() - t2) / 1e9}%.2f s rows=$n2")
    }
    spark.stop()
  }
}
