package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Skyline
import graft.pipeline.{TextAnalysis, Web}

/** Scale canary for the round-9 newcomers the verdict asked to probe
  * (ngramDiversity's gram explosion, anchorTexts' anchor regex,
  * frontierND at 4-D) plus the round-10 mergeable-state twins — all
  * over deterministic in-plan synthetics. Recorded in BENCH_NOTES.md;
  * rerun ad hoc, not part of the per-round bench.
  *
  * Usage: runMain graft.tools.Round10ScaleProbe [n=10000000] [filter]
  */
object Round10ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val filter = if (args.length > 1)
      args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit =
      if (filter.isEmpty || filter.exists(name.contains)) {
        val t0 = System.nanoTime()
        val rows = f
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
      }

    // 16-token docs over a 50k-word vocabulary, 20 sources: ~13 windows
    // per doc → 13n gram rows through the (grp, g) exchange; enough
    // vocabulary that most grams are singletons (the worst case for the
    // count aggregate), enough reuse that repeats exist
    def docs = spark.range(n).repartition(64)
      .select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        concat_ws(" ", (0 until 16).map(k =>
          concat(lit("w"), pmod(hash(col("id"), lit(k)), lit(50000)))): _*)
          .as("text"))

    timed(s"ngramDiversity (4-grams) over $n docs") {
      TextAnalysis.ngramDiversity(docs, "source", "text", 4).count()
    }

    timed(s"ngramDiversity SKETCH state (HLL, constant bytes/group) over $n docs") {
      TextAnalysis.ngramDiversityFromSketch(
        TextAnalysis.ngramDiversitySketchState(docs, "source", "text", 4),
        "source").count()
    }

    timed(s"ngramDiversity incremental merge, two $n/2-doc batches") {
      val a = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      val b = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      TextAnalysis.ngramDiversityFromState(
        TextAnalysis.mergeNgramCounts(
          TextAnalysis.ngramDiversityState(a, "source", "text", 4),
          TextAnalysis.ngramDiversityState(b, "source", "text", 4)),
        "source").count()
    }

    // 2 anchors per page (one dst-diverse, one shared), the regex parse
    // over the html column is the cost under probe; 100k src hosts
    def pages = spark.range(n).repartition(64)
      .select(col("id").as("doc_id"),
        concat(lit("http://h"), pmod(col("id"), lit(100000)), lit(".com/p/"),
          col("id")).as("url"),
        concat(lit("<html><body><a href=\"http://site"),
          pmod(hash(col("id")), lit(200000)),
          lit(".com/x\">Link A</a> filler text <a href=\"http://ref"),
          pmod(col("id"), lit(500)),
          lit(".org/\">B</a></body></html>")).as("html"))

    timed(s"anchorTexts (regex parse + state aggregate) over $n pages") {
      Web.anchorTexts(pages, "url", "html").count()
    }

    timed(s"anchorTexts incremental merge, two $n/2-page batches") {
      val a = pages.where(pmod(col("doc_id"), lit(2)) === 0)
      val b = pages.where(pmod(col("doc_id"), lit(2)) === 1)
      Web.anchorTextsFromState(
        Web.mergeAnchorState(
          Web.anchorTextState(a, "url", "html"),
          Web.anchorTextState(b, "url", "html"))).count()
    }

    // real WAV decode throughput through the batched seam: 1M
    // synthesized 2048-sample containers (~2 GB of WAV bytes) →
    // javax.sound parse → u8 PCM → silence profile, one pass
    if (filter.isEmpty || filter.exists(f => "WAV encode+decode+profile wav decode throughput".contains(f))) {
      import spark.implicits._
      import graft.pipeline.Multimodal
      val nClips = math.min(n, 1000000L)
      val t0 = System.nanoTime()
      val wavs = spark.range(nClips).repartition(64)
        .select(col("id")).as[Long]
        .map { id =>
          val samples = Array.tabulate(2048)(i =>
            ((id * 37 + i.toLong * 11) % 256).toByte)
          Multimodal.MediaRow(id, Multimodal.wavBytesU8(samples, 8000))
        }
      val media = Multimodal.pcmMedia(
        Multimodal.decodeAudioBatched(wavs)().toDF, 16)
      val rows = Multimodal.silenceStats(media, 16, 20000L).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"WAV encode+decode+profile, $nClips%d x 2048-sample clips: " +
        f"$secs%.1f s ($rows rows, ${nClips / secs / 1000}%.0f kclips/s)")
    }

    // real PNG decode throughput through the batched seam (the WAV
    // probe exposed JDK provider-registry contention; check imageio):
    // one 64x64 PNG synthesized driver-side, decoded 200k times across
    // the pool vs 2k times single-thread
    if (filter.isEmpty || filter.exists(f => "PNG decode+aHash png decode throughput".contains(f))) {
      import spark.implicits._
      import graft.pipeline.Multimodal
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 64; x <- 0 until 64)
        img.getRaster.setSample(x, y, 0, (x * 4 + y) % 256)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val png = bos.toByteArray
      var w0 = 0
      while (w0 < 200) { Multimodal.imageIoDecode(png, 16, 8); w0 += 1 }
      val t1 = System.nanoTime()
      var i1 = 0
      while (i1 < 2000) { Multimodal.imageIoDecode(png, 16, 8); i1 += 1 }
      val single = (System.nanoTime() - t1) / 2000.0 / 1000
      println(f"PNG decode single-thread: $single%.1f us/image")
      val nImgs = 200000L
      val t2 = System.nanoTime()
      val rows = Multimodal.decodeBatched(
        spark.range(nImgs).repartition(64).select(col("id")).as[Long]
          .map(id => Multimodal.MediaRow(id, png)), 16, 8)(
        Multimodal.imageIoDecode).count()
      val secs = (System.nanoTime() - t2) / 1e9
      println(f"PNG decode x$nImgs%d on the pool: $secs%.1f s " +
        f"($rows rows, ${nImgs / secs / 1000}%.0f kimg/s = " +
        f"${1e6 / (nImgs / secs)}%.0f us/image effective)")
      val t3 = System.nanoTime()
      val rows2 = Multimodal.imageIoDecodeBatched(
        spark.range(nImgs).repartition(64).select(col("id")).as[Long]
          .map(id => Multimodal.MediaRow(id, png)), 16, 8).count()
      val secs2 = (System.nanoTime() - t3) / 1e9
      println(f"PNG decode x$nImgs%d reader-reuse: $secs2%.1f s " +
        f"($rows2 rows, ${nImgs / secs2 / 1000}%.0f kimg/s)")
    }

    // gridBuckets = 8 keeps 8^4 = 4096 cells under the 16384 driver
    // bound (the default 16 only fits up to 3 dimensions)
    // span-level decontamination at corpus scale: a 20k-doc benchmark
    // against n training docs; planted contamination — every 97th train
    // doc embeds a benchmark doc's exact token run, so matches exist
    // and only matched windows explode into positions
    if (filter.isEmpty || filter.exists(f => "decontaminateSpans removeContaminatedSpans span decontamination".contains(f))) {
      import graft.pipeline.TrainingData
      val bench = spark.range(20000).repartition(8)
        .select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 12).map(k =>
            concat(lit("b"), pmod(hash(col("id"), lit(k + 100)), lit(30000)))): _*)
            .as("text"))
      val train = spark.range(n).repartition(64)
        .select(col("id").as("doc_id"),
          when(pmod(col("id"), lit(97)) === 0,
            concat(
              concat_ws(" ", (0 until 6).map(k =>
                concat(lit("w"), pmod(hash(col("id"), lit(k)), lit(50000)))): _*),
              lit(" "),
              concat_ws(" ", (0 until 12).map(k =>
                concat(lit("b"), pmod(hash(pmod(col("id"), lit(20000)),
                  lit(k + 100)), lit(30000)))): _*)))
          .otherwise(
            concat_ws(" ", (0 until 18).map(k =>
              concat(lit("w"), pmod(hash(col("id"), lit(k)), lit(50000)))): _*))
          .as("text"))
      timed(s"decontaminateSpans, $n train docs vs 20k-doc benchmark") {
        TrainingData.decontaminateSpans(train, bench, "doc_id", "text", 8)
          .count()
      }
      timed(s"removeContaminatedSpans, $n train docs") {
        // a bare count() lets Catalyst ELIMINATE the left join (the
        // aggregated right side has distinct keys and no referenced
        // columns) and skip all the work — force the strip itself
        TrainingData.removeContaminatedSpans(train, bench, "doc_id",
            "text", 8)
          .agg(sum(col("n_tokens_removed")).cast("long"),
            sum(length(col("clean_text"))))
          .collect()(0).getLong(0)
      }
    }

    timed(s"4-D skyline over $n rows") {
      val pts = spark.range(n).repartition(64)
        .select(col("id"),
          pmod(hash(col("id"), lit(1)), lit(100000)).cast("long").as("x"),
          pmod(hash(col("id"), lit(2)), lit(100000)).cast("long").as("y"),
          pmod(hash(col("id"), lit(3)), lit(100000)).cast("long").as("z"),
          pmod(hash(col("id"), lit(4)), lit(100000)).cast("long").as("u"))
      Skyline.frontierND(pts, Seq("x", "y", "z", "u"), gridBuckets = 8)
        .count()
    }

    spark.stop()
  }
}
