package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.query.AnnQuery

/** Streamed appends must leave the store byte-equivalent in query
  * behavior to batch appends of the same rows, and batch replays must
  * not double-ingest. */
class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val config =
    IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 16, maxIter = 20)

  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(29)
    val blobs = Seq.tabulate(4)(_ => Array.fill(dim)(rnd.nextDouble() * 20 - 10))
    for {
      (blob, b) <- blobs.zipWithIndex
      i <- 0 until 30
    } yield ((b * 30 + i).toLong,
      blob.map(v => (v + rnd.nextGaussian() * 0.5).toFloat).toSeq)
  }
  private lazy val df = data.toDF("id", "vec")
  private lazy val (model, encoded) =
    IvfPqBuilder.fit(df, "id", "vec", dim, config)

  private def withStore(test: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_ingest").toString
    try test(dir)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("streamed micro-batches append like batch appends; queries agree") {
    withStore { dir =>
      // store starts with the even ids; the stream delivers the odd ids
      // over two triggers
      IvfPqBuilder.save(model,
        IvfPqBuilder.encode(model, df.where(col("id") % 2 === 0), "id", "vec"),
        dir)
      val odd = data.filter(_._1 % 2 != 0)
      val (b1, b2) = odd.splitAt(odd.length / 2)
      implicit val sq = spark.sqlContext
      val mem = MemoryStream[(Long, Seq[Float])]
      val ckpt = java.nio.file.Files.createTempDirectory("ingest_ck").toString
      val q = StreamingIngest.ingest(
        mem.toDF().toDF("id", "vec"), model, "id", "vec", dir, ckpt)
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()

      val (loaded, codes) = IvfPqBuilder.load(spark, dir)
      assert(codes.count() === data.length)
      val probe = data.head._2.map(_.toDouble).toArray
      val fromStored = AnnQuery.topK(codes, loaded, probe, 5, 4)
        .collect().map(r => (r.getLong(0), r.getAs[Double]("sq_dist"))).toSeq
      val fromMem = AnnQuery.topK(encoded, model, probe, 5, 4)
        .collect().map(r => (r.getLong(0), r.getAs[Double]("sq_dist"))).toSeq
      assert(fromStored === fromMem)
    }
  }

  test("a replayed batch id is skipped: no double ingest") {
    withStore { dir =>
      IvfPqBuilder.save(model,
        IvfPqBuilder.encode(model, df.where(col("id") < 60), "id", "vec"), dir)
      val tail = df.where(col("id") >= 60)
      val events = scala.collection.mutable.Buffer[String]()
      assert(StreamingIngest.ingestBatch(model, tail, "id", "vec", dir, 7L,
        events += _))
      // same batch id again — e.g. a foreachBatch retry after a crash
      assert(!StreamingIngest.ingestBatch(model, tail, "id", "vec", dir, 7L,
        events += _))
      assert(events.exists(_.contains("already applied")))
      val (_, codes) = IvfPqBuilder.load(spark, dir)
      assert(codes.count() === data.length) // not data.length + replays
      // a NEW batch id still appends (marker is per-batch, not global)
      assert(codes.select("id").distinct().count() === data.length)
    }
  }
}
