package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.query.ExactKnn

/** SQ8 codec invariants: bounded reconstruction error, ranking fidelity,
  * degenerate dimensions. */
class Sq8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(13)
    // clusters + one CONSTANT dimension (index 7) to hit the Δ=0 path
    Seq.tabulate(60) { i =>
      val c = i % 3
      (i.toLong, Seq.tabulate(dim)(j =>
        if (j == 7) 4.25f
        else (c * 10.0 + rnd.nextGaussian() * 0.3).toFloat))
    }
  }
  private lazy val df = data.toDF("id", "vec")
  private lazy val model = Sq8.fit(df, "vec", dim)
  private lazy val enc = Sq8.encode(model, df, "id", "vec").cache()

  test("fit: per-dim codec; constant dimension gets Δ = 0") {
    assert(model.mins.length === dim && model.scales.length === dim)
    assert(model.scales(7) === 0.0)
    assert(math.abs(model.mins(7) - 4.25) < 1e-6)
    assert(model.scales.take(7).forall(_ > 0))
  }

  test("reconstruction error bounded by Δ_i/2 per dimension") {
    val byId = data.toMap
    Sq8.decoded(model, enc).collect().foreach { r =>
      val orig = byId(r.getLong(0))
      val dec = r.getSeq[Double](1)
      (0 until dim).foreach { j =>
        val bound = model.scales(j) / 2 + 1e-9
        assert(math.abs(dec(j) - orig(j)) <= bound,
          s"dim $j: |${dec(j)} - ${orig(j)}| > $bound")
      }
    }
  }

  test("codes are one byte per dimension") {
    enc.collect().foreach { r =>
      assert(r.getAs[Array[Byte]]("sq8").length === dim)
    }
  }

  test("topK matches exact k-NN on clustered data (8-bit is near-exact)") {
    val q = data.head._2.map(_.toDouble).toArray
    val viaSq8 = Sq8.topK(enc, model, q, 10)
      .collect().map(_.getLong(0)).toSeq
    val exact = ExactKnn.topK(df, "vec", "id", data.head._2, 10)
      .collect().map(_.getLong(0)).toSeq
    // within-cluster points are near-ties whose order can swap under
    // half-step quantization error; the query itself must rank first and
    // the result set must stay the query's own cluster (high overlap)
    assert(viaSq8.head === exact.head)
    assert(viaSq8.toSet.intersect(exact.toSet).size >= 8,
      s"sq8=$viaSq8 exact=$exact")
  }

  test("distances ascend and agree with a decode-side recompute") {
    val q = data(5)._2.map(_.toDouble).toArray
    val qLit = typedlit(q.toSeq)
    val hits = Sq8.topK(enc, model, q, 10)
    val dists = hits.collect().map(_.getDouble(1)).toSeq
    assert(dists === dists.sorted)
    val bad = hits.join(Sq8.decoded(model, enc), "id")
      .withColumn("rec", aggregate(zip_with(col("decoded"), qLit,
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
      .where(abs(col("sq_dist") - col("rec")) > 1e-9)
      .count()
    assert(bad === 0)
  }

  test("save/load round-trips the codec exactly; answers bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("sq8_rt").toString
    try {
      Sq8.save(model, enc, dir)
      val (loaded, codes) = Sq8.load(spark, dir)
      assert(loaded.dim === model.dim)
      assert(loaded.mins.toSeq === model.mins.toSeq)     // f64 exact
      assert(loaded.scales.toSeq === model.scales.toSeq)
      val q = data(3)._2.map(_.toDouble).toArray
      val mem = Sq8.topK(enc, model, q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val st = Sq8.topK(codes, loaded, q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(st === mem)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("load rejects a codec whose shape contradicts the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("sq8_bad").toString
    try {
      Sq8.save(model, enc, dir)
      // corrupt: overwrite manifest with the wrong dimension
      val mPath = new org.apache.hadoop.fs.Path(s"$dir/manifest.json")
      val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(mPath, true)
      try out.write("""{"vector_size":7}""".getBytes("UTF-8"))
      finally out.close()
      assertThrows[IllegalArgumentException] { Sq8.load(spark, dir) }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
