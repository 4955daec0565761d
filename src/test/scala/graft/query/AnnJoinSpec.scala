package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.{IvfPqBuilder, IvfPqConfig}
import graft.pipeline.Dedup

class AnnJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  // 4 separated blobs × 10 seeds × 3 clones: near-dup pairs are clone
  // pairs (cosine ≈ 1), cross-seed/cross-blob cosine is far lower
  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    val blobs = Seq.tabulate(4)(_ => Array.fill(dim)(rnd.nextDouble() * 20 - 10))
    for {
      (blob, b) <- blobs.zipWithIndex
      seed <- 0 until 10
      seedVec = blob.map(v => v + rnd.nextGaussian() * 1.0)
      clone <- 0 until 3
    } yield (((b * 10 + seed) * 3 + clone).toLong,
      seedVec.map(v => (v + rnd.nextGaussian() * 0.01).toFloat).toSeq)
  }

  private lazy val df = data.toDF("vec_id", "embedding")

  private def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cosineSelfJoin: no false positives, full recall on clustered data") {
    val (model, _) = IvfPqBuilder.fit(df, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 8, maxIter = 20))
    val brute = pairs(Dedup.embeddingNearDupPairs(df, thresholdMilli = 999))
    val ivf = pairs(AnnJoin.cosineSelfJoin(df, "vec_id", "embedding",
      model, thresholdMilli = 999, nprobe = 2))
    assert(brute.nonEmpty) // the clone pairs
    assert(ivf.subsetOf(brute), "false positives escaped cosine verification")
    assert(ivf === brute, "missed pairs despite same-cell clones")
  }

  test("cosineSelfJoin: threshold is respected (verified exact cosine)") {
    val (model, _) = IvfPqBuilder.fit(df, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 8, maxIter = 20))
    // impossible threshold → empty
    val none = AnnJoin.cosineSelfJoin(df, "vec_id", "embedding",
      model, thresholdMilli = 1001, nprobe = 2)
    assert(none.count() === 0)
  }

  test("cosineSelfJoin: salt-invariant on a hot-cell corpus") {
    // one tight blob → every vector lands in the same IVF cell: the
    // exact regime the default salt exists for — output must be
    // IDENTICAL for any salt (the sub-bucketing only splits tasks)
    val rnd = new scala.util.Random(7)
    val center = Array.fill(dim)(rnd.nextDouble() * 10 - 5)
    val hot = Seq.tabulate(60)(i =>
      (i.toLong, center.map(v => (v + rnd.nextGaussian() * 0.01).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val (model, _) = IvfPqBuilder.fit(hot, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 2, numDivisions = 4, numCodes = 8, maxIter = 20))
    val defSalt = pairs(AnnJoin.cosineSelfJoin(hot, "vec_id", "embedding",
      model, thresholdMilli = 999, nprobe = 1))
    val salt1 = pairs(AnnJoin.cosineSelfJoin(hot, "vec_id", "embedding",
      model, thresholdMilli = 999, nprobe = 1, salt = 1))
    val salt8 = pairs(AnnJoin.cosineSelfJoin(hot, "vec_id", "embedding",
      model, thresholdMilli = 999, nprobe = 1, salt = 8))
    assert(defSalt.nonEmpty)
    assert(defSalt === salt1 && defSalt === salt8)
  }

  test("auto salt (salt = 0): skewed buckets choose > default, output unchanged") {
    // recommendedSalt is the clamped ceil of max-cell/mean-cell, empty
    // cells counted — the drift-telemetry convention
    assert(AnnJoin.recommendedSalt(Seq(100L), numPartitions = 10) === 10)
    assert(AnnJoin.recommendedSalt(Seq(10L, 10L, 10L, 10L),
      numPartitions = 4) === 4) // balanced → floor
    assert(AnnJoin.recommendedSalt(Seq(1000000L), numPartitions = 1000) === 64,
      "cap") // clamped
    assert(AnnJoin.recommendedSalt(Nil, numPartitions = 4) === 4)
    // a model with 8 cells fit on spread data, then joined over a corpus
    // living in ONE blob: the join's own bucket histogram is skewed and
    // auto mode must pick salt > the default 4 while emitting the exact
    // same pairs
    val (model, _) = IvfPqBuilder.fit(df, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 8, numDivisions = 4, numCodes = 8,
        maxIter = 20))
    val skewed = df.where($"vec_id" < 30) // blob 0 only: 10 seeds × 3 clones
    val manual = pairs(AnnJoin.cosineSelfJoin(skewed, "vec_id", "embedding",
      model, thresholdMilli = 999, nprobe = 1, salt = 4))
    val auto = pairs(AnnJoin.cosineSelfJoin(skewed, "vec_id", "embedding",
      model, thresholdMilli = 999, nprobe = 1, salt = 0))
    assert(auto === manual)
    assert(manual.nonEmpty)
    // the histogram auto mode sees: 30 rows over ≤ a few of 8 cells
    import graft.functions.FastFunctions.topCellsL2
    import org.apache.spark.sql.functions.{col, explode}
    val counts = skewed
      .select(explode(topCellsL2(col("embedding"),
        model.partitionCentroids.flatten.toSeq, 1)).as("cell"))
      .groupBy("cell").count().collect().map(_.getLong(1)).toSeq
    assert(AnnJoin.recommendedSalt(counts, 8) > 4,
      s"skewed corpus histogram $counts did not raise the salt")
  }

  private def graph(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    d.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cosineBipartiteJoin: no false pairs, full recall across sides; streaming ≡ batch") {
    import org.apache.spark.sql.functions.col
    import graft.functions.FastFunctions.cosineF
    val (model, _) = IvfPqBuilder.fit(df, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 8, maxIter = 20))
    // one clone of each triple is the "new batch"; its 2 siblings stay
    // in the corpus, so every true pair straddles the sides
    val newE = df.where(col("vec_id") % 3 === 0)
    val corpusE = df.where(col("vec_id") % 3 =!= 0)
    val exact = newE.select(col("vec_id").as("new_id"), col("embedding").as("nv"))
      .crossJoin(corpusE.select(col("vec_id").as("corpus_id"),
        col("embedding").as("cv")))
      .where(cosineF(col("nv"), col("cv")) * 1000 >= 999)
      .select("new_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = AnnJoin.cosineBipartiteJoin(newE, corpusE, "vec_id", "embedding",
        model, thresholdMilli = 999, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty) // clone siblings across the split
    assert(ivf === exact)
    // stream-safe: the same join over a MemoryStream of new batches
    // emits each batch's pairs in its own trigger, total ≡ batch
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val newRows = newE.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val sdf = stream.toDF().toDF("vec_id", "embedding")
    val q = AnnJoin.cosineBipartiteJoin(sdf, corpusE, "vec_id", "embedding",
        model, thresholdMilli = 999, nprobe = 2)
      .writeStream.format("memory").queryName("bipartite_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = newRows.splitAt(newRows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("bipartite_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === exact)
    } finally q.stop()
  }

  test("knnJoin (approximate): full parity with exact kNN graph on clustered data") {
    // clone triples sit in one cell; each vector's 2 nearest are its
    // clones, so the cell-bucketed join must reproduce the exact graph
    val (model, _) = IvfPqBuilder.fit(df, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 8, maxIter = 20))
    val exact = graph(ExactKnn.knnJoin(df, "embedding", "vec_id", 2))
    val ann = AnnJoin.knnJoin(df, "vec_id", "embedding", model, k = 2,
      nprobe = 2)
    // contract: exactly k rows per query, ranks 1..k
    val perQ = ann.groupBy("qid").count().collect()
    assert(perQ.length === data.length && perQ.forall(_.getLong(1) === 2L))
    assert(graph(ann) === exact)
  }

  test("embeddingDropList: IVF pairs produce the same drop list as exact pairs") {
    import org.apache.spark.sql.functions.col
    val (model, _) = IvfPqBuilder.fit(df, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 8, maxIter = 20))
    val ids = df.select(col("vec_id").as("doc_id"))
    val exact = pairs(Dedup.embeddingDropList(ids,
      Dedup.embeddingNearDupPairs(df, thresholdMilli = 999)))
    val ivf = pairs(Dedup.embeddingDropList(ids,
      AnnJoin.cosineSelfJoin(df, "vec_id", "embedding", model,
        thresholdMilli = 999, nprobe = 2)))
    assert(exact.nonEmpty) // clone clusters each drop 2 of 3 members
    assert(ivf === exact)
  }

  test("knnJoin: reported neighbors carry true ranks (subset at nprobe=1) " +
    "and are salt-invariant") {
    val (model, _) = IvfPqBuilder.fit(df, "vec_id", "embedding", dim,
      IvfPqConfig(numPartitions = 4, numDivisions = 4, numCodes = 8, maxIter = 20))
    val exact = graph(ExactKnn.knnJoin(df, "embedding", "vec_id", 2))
    val g1 = graph(AnnJoin.knnJoin(df, "vec_id", "embedding", model,
      k = 2, nprobe = 1, salt = 1))
    val g8 = graph(AnnJoin.knnJoin(df, "vec_id", "embedding", model,
      k = 2, nprobe = 1, salt = 8))
    assert(g1 === g8, "salt changed the result")
    // misses are the ONLY error mode: with clone triples co-celled even
    // nprobe=1 finds every true edge (clones share the home cell)
    assert(g1 === exact)
  }
}
