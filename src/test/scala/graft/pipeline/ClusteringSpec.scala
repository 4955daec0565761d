package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 well-separated blobs of 40/20/10 points in 4-d, deterministic
  private def blobs = {
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array(0f, 0f, 0f, 0f), Array(10f, 10f, 10f, 10f),
      Array(-10f, 10f, -10f, 10f))
    val sizes = Seq(40, 20, 10)
    val rows = for {
      (c, b) <- centers.zip(sizes).zipWithIndex.map { case ((c, s), b) => ((c, s), b) }
      i <- 0 until c._2
    } yield (b * 1000L + i, c._1.map(x => x + rnd.nextFloat() * 0.5f), b)
    rows.toDF("id", "vec", "blob")
  }

  test("cluster recovers well-separated blobs (one cluster per blob)") {
    val out = Clustering.cluster(blobs, "vec", k = 3, seed = 11,
      trainPointsPerCentroid = 0)
    // every blob maps to exactly one cluster and vice versa
    val m = out.groupBy("blob")
      .agg(countDistinct(col("cluster")).as("nc")).collect()
    assert(m.forall(_.getLong(1) == 1L))
    assert(out.select("cluster").distinct().count() === 3L)
    assert(out.count() === 70L)
  }

  test("assignment is the argmin over the centroid table (HOF cross-check)") {
    val model = Clustering.fit(blobs, "vec", k = 3, seed = 11,
      trainPointsPerCentroid = 0)
    val out = Clustering.assign(blobs, "vec", model)
    // independent argmin: explode the centroid table, L2 via zip_with,
    // min-by distance with ties toward the smaller cluster id
    val cents = model.centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq.toDF("cid", "cent")
    val indep = out.crossJoin(broadcast(cents))
      .withColumn("d2", aggregate(
        zip_with(col("vec"), col("cent"),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("d2"), col("cid"))))
      .where(col("rk") === 1)
      .select(col("id"), col("cid"))
    val diff = out.select(col("id"), col("cluster"))
      .join(indep, "id")
      .where(col("cluster") =!= col("cid")).count()
    assert(diff === 0L)
  }

  test("balanced quotas: equal shares, remainder to the smallest ids") {
    val assigned = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L),
      (6L, 1L), (7L, 1L), (8L, 2L)).toDF("id", "cluster")
    val q = Clustering.clusterQuotas(assigned, total = 7, mode = "balanced")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(q === Map(0L -> 3L, 1L -> 2L, 2L -> 2L)) // 7 = 2+2+2, +1 to id 0
  }

  test("proportional quotas: largest-remainder, exact total") {
    val assigned = Seq.tabulate(10)(i => (i.toLong, 0L)) ++
      Seq.tabulate(6)(i => (100L + i, 1L)) ++
      Seq.tabulate(4)(i => (200L + i, 2L))
    val df = assigned.toDF("id", "cluster")
    val q = Clustering.clusterQuotas(df, total = 7, mode = "proportional")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // shares: 3.5 / 2.1 / 1.4 -> bases 3/2/1, leftover 1 to the largest
    // remainder (cluster 0 at .5)
    assert(q === Map(0L -> 4L, 1L -> 2L, 2L -> 1L))
    assert(q.values.sum === 7L)
  }

  test("balancedSample: per-cluster counts equal min(quota, size)") {
    val out = Clustering.balancedSample(blobs, "id", "vec", k = 3,
      total = 24, seed = 11, mode = "balanced",
      trainPointsPerCentroid = 0)
    val counts = out.groupBy("cluster").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(counts === Seq(8L, 8L, 8L)) // every blob >= 8 members
    // determinism
    val again = Clustering.balancedSample(blobs, "id", "vec", k = 3,
      total = 24, seed = 11, mode = "balanced",
      trainPointsPerCentroid = 0)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("fromIvf reuses a fitted index's partitions as clusters") {
    val vecs = blobs.select(col("id"), col("vec"))
    val (ivf, _) = graft.index.IvfPqBuilder.fit(vecs, "id", "vec", 4,
      graft.index.IvfPqConfig(numPartitions = 3, numDivisions = 2,
        numCodes = 4, maxIter = 15))
    val model = Clustering.fromIvf(ivf)
    val out = Clustering.assign(blobs, "vec", model)
    // the IVF coarse fit separates the same 3 well-separated blobs
    val m = out.groupBy("blob")
      .agg(countDistinct(col("cluster")).as("nc")).collect()
    assert(m.forall(_.getLong(1) == 1L))
    val sample = Clustering.balancedSampleAssigned(
      out.localCheckpoint(), "id", total = 9, seed = 3)
    assert(sample.count() === 9L)
  }

  test("prototypePrune: per-cluster floor quota, the CLOSEST rows " +
      "drop, brute-force parity, 0/100 pct edges") {
    val model = Clustering.fit(blobs, "vec", k = 3, seed = 11,
      trainPointsPerCentroid = 0)
    val wd = Clustering.assignWithDistance(blobs, "vec", model)
      .select(col("id"), col("cluster"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute-force expected kept set at dropPct = 30
    val want = wd.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      ordered.drop(rows.size * 30 / 100).map(_._1).toSeq
    }.toSet
    val kept = Clustering.prototypePrune(blobs, "id", "vec", model, 30)
    assert(kept.select("id").as[Long].collect().toSet === want)
    // blob sizes 40/20/10 -> drop 12/6/3, keep 28/14/7
    assert(kept.groupBy("cluster").count().select("count").as[Long]
      .collect().sorted.toSeq === Seq(7L, 14L, 28L))
    // edges: 0% keeps everything, 100% drops everything
    assert(Clustering.prototypePrune(blobs, "id", "vec", model, 0)
      .count() === 70L)
    assert(Clustering.prototypePrune(blobs, "id", "vec", model, 100)
      .count() === 0L)
    // kept rows carry d2 >= every dropped d2 within the cluster
    val keptMin = kept.groupBy("cluster").agg(min("d2").as("lo"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dropMax = wd.filterNot(r => want(r._1)).groupBy(_._2)
      .map { case (c, rs) => c -> rs.map(_._3).max }
    dropMax.foreach { case (c, hi) => assert(hi <= keptMin(c)) }
  }
}
