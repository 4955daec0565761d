package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.AnnQuery

/** The streaming ANN probe path (annTopKPerQuery) must answer like the
  * driver-planned batch path (AnnQuery.topK): same ids per query, same
  * distances up to float summation order — in batch mode AND per
  * micro-batch over a MemoryStream. */
class StreamingKnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val config =
    IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 16, maxIter = 20)

  // same fixture shape as IvfPqSpec: separated blobs so probes are stable
  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    val blobs = Seq.tabulate(4)(_ => Array.fill(dim)(rnd.nextDouble() * 20 - 10))
    for {
      (blob, b) <- blobs.zipWithIndex
      i <- 0 until 40
    } yield ((b * 40 + i).toLong,
      blob.map(v => (v + rnd.nextGaussian() * 0.5).toFloat).toSeq)
  }
  private lazy val df = data.toDF("id", "vec")
  private lazy val (model, encoded) =
    IvfPqBuilder.fit(df, "id", "vec", dim, config)
  private lazy val codes = encoded.select("id", "partition", "codes").cache()

  private def expected(qid: Long, k: Int, nprobe: Int) =
    AnnQuery.topK(codes, model, data(qid.toInt)._2.map(_.toDouble).toArray,
        k, nprobe)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toSeq

  test("annTopKPerQuery (batch) equals AnnQuery.topK per query") {
    val qids = Seq(0L, 45L, 130L)
    val queries = qids.map(q => q -> data(q.toInt)._2).toDF("qid", "qvec")
    val got = StreamingKnn.annTopKPerQuery(
        queries, "qid", "qvec", codes, model, k = 5, nprobe = 2)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(3))
        .map(r => r.getLong(1) -> r.getDouble(2)).toSeq).toMap
    qids.foreach { qid =>
      val want = expected(qid, 5, 2)
      assert(got(qid).map(_._1) === want.map(_._1), s"ids for query $qid")
      got(qid).zip(want).foreach { case ((_, d1), (_, d2)) =>
        assert(math.abs(d1 - d2) <= 1e-9 * math.max(1.0, d2), s"dist, q $qid")
      }
    }
  }

  test("annTopKPerQuery streams: each trigger answers its queries") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val sdf = stream.toDF().toDF("qid", "qvec")
    val q = StreamingKnn.annTopKPerQuery(
        sdf, "qid", "qvec", codes, model, k = 3, nprobe = 2)
      .writeStream.format("memory").queryName("stream_ann")
      .outputMode("update").start()
    try {
      stream.addData((7L, data(7)._2))
      q.processAllAvailable()
      stream.addData((90L, data(90)._2))
      q.processAllAvailable()
      val got = spark.table("stream_ann").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq).toMap
      assert(got(7L) === expected(7L, 3, 2).map(_._1))
      assert(got(90L) === expected(90L, 3, 2).map(_._1))
    } finally q.stop()
  }

  test("hammingTopKPerQuery streams: per-trigger ≡ BinaryQuant.rankedIds") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val sdf = stream.toDF().toDF("qid", "qvec")
    val q = StreamingKnn.hammingTopKPerQuery(
        sdf, "qid", "qvec", df, "id", "vec", k = 5,
        thresholds = null, dim = dim)
      .writeStream.format("memory").queryName("stream_ham")
      .outputMode("update").start()
    try {
      stream.addData((3L, data(3)._2))
      q.processAllAvailable()
      stream.addData((77L, data(77)._2))
      q.processAllAvailable()
      val got = spark.table("stream_ham").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getLong(3))
          .map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
      for (qid <- Seq(3L, 77L)) {
        val want = graft.index.BinaryQuant
          .rankedIds(df, "vec", "id", data(qid.toInt)._2, 5)
          .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
        assert(got(qid) === want)
      }
    } finally q.stop()
  }

  test("annTopKPerQueryOpq streams: per-trigger answers equal OPQ topK") {
    implicit val sqlCtx = spark.sqlContext
    val (opqModel, opqEncoded) =
      graft.index.OpqBuilder.fit(df, "id", "vec", dim, config, opqIters = 3)
    val opqCodes = opqEncoded.select("id", "partition", "codes").cache()
    def expectedOpq(qid: Long) =
      graft.index.OpqBuilder.topK(opqCodes, opqModel,
          data(qid.toInt)._2.map(_.toDouble).toArray, 3, 2)
        .collect().map(_.getLong(0)).toSeq
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = StreamingKnn.annTopKPerQueryOpq(
        stream.toDF().toDF("qid", "qvec"), "qid", "qvec", opqCodes, opqModel,
        k = 3, nprobe = 2)
      .writeStream.format("memory").queryName("stream_ann_opq")
      .outputMode("update").start()
    try {
      stream.addData((7L, data(7)._2))
      q.processAllAvailable()
      stream.addData((90L, data(90)._2))
      q.processAllAvailable()
      val got = spark.table("stream_ann_opq").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq).toMap
      assert(got(7L) === expectedOpq(7L))
      assert(got(90L) === expectedOpq(90L))
    } finally {
      q.stop()
      opqCodes.unpersist()
      ()
    }
  }

  test("ingestToStore: streamed appends equal a batch encode; telemetry per batch") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ingest_ck").toString
    try {
      // seed: stored index over the first half (the initial batch build)
      val firstHalf = df.where(col("id") < 80)
      IvfPqBuilder.save(model,
        IvfPqBuilder.encode(model, firstHalf, "id", "vec"), dir)
      val log = scala.collection.mutable.ArrayBuffer.empty[String]
      val stream = MemoryStream[(Long, Seq[Float])]
      val q = StreamingKnn.ingestToStore(stream.toDF().toDF("id", "vec"),
          "id", "vec", model, dir, s => log.synchronized { log += s })
        .option("checkpointLocation", ckpt).start()
      try {
        stream.addData(data.filter(d => d._1 >= 80 && d._1 < 120))
        q.processAllAvailable()
        stream.addData(data.filter(_._1 >= 120))
        q.processAllAvailable()
      } finally q.stop()
      // stored contents = batch encode of ALL vectors (pure function of
      // model + vector, regardless of how rows were batched)
      val (_, codesStored) = IvfPqBuilder.load(spark, dir)
      val got = codesStored.select("id", "partition", "codes").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2).toSeq)).toMap
      val want = encoded.select("id", "partition", "codes").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2).toSeq)).toMap
      assert(got === want)
      // telemetry fired once per non-empty trigger
      assert(log.count(_.startsWith("ingest batch")) === 2)
      assert(log.count(_.contains("imbalance")) === 2)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      new Directory(new java.io.File(ckpt)).deleteRecursively()
    }
  }
}
