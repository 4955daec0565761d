package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.pipeline.{Dedup, Drift, Sketches}
import graft.sources.FixedWidthCorpus

/** Scale canary for the round-8 session-5 additions: sorted-
  * neighborhood linkage, basket co-occurrence, the chi-square/KS
  * drift pair over histogram state, the AMS F2 sketch, and fixed-
  * width parsing — all over deterministic in-plan synthetics.
  * Recorded in BENCH_NOTES.md; rerun ad hoc, not part of the
  * per-round bench.
  *
  * Usage: runMain graft.tools.FamilyScaleProbe [n=1000000] [filter]
  */
object FamilyScaleProbe {
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

    def timed(name: String)(f: => Long): Unit =
      if (filter.isEmpty || filter.exists(name.contains)) {
        val t0 = System.nanoTime()
        val rows = f
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
      }

    timed(s"sorted-neighborhood linkage over $n serials") {
      // zero-padded serials of 3·id: within a 10k-serial block,
      // consecutive rows differ in the low digits — every id pair
      // (i, i+1) whose serials are 1 substitution apart is a planted
      // neighbor at window 1
      val serials = spark.range(n).repartition(64)
        .select(col("id"),
          lpad((col("id") * 3).cast("string"), 12, "0").as("s"))
        .withColumn("bk", substring(col("s"), 1, 8))
        .localCheckpoint()
      Dedup.sortedNeighborPairs(serials, "id", "s", "bk",
        window = 2, maxDist = 1).count()
    }

    timed(s"co-occurrence projection over $n basket items") {
      // n/5 baskets × 5 slots; items hash-skewed over n/50 ids with a
      // quadratic hub profile — the shape the maxBasketSize guard and
      // the pair groupBy must survive
      val items = math.max(n / 50, 100L)
      val bi = spark.range(n).repartition(64)
        .select((col("id") / 5).cast("long").as("basket"),
          expr(s"cast(pow((hash(id, 7) & 2147483647) / 2147483648.0, 2)" +
            s" * $items as long)").as("item"))
        .localCheckpoint()
      Graph.coOccurrence(bi, "basket", "item",
        minCount = 2L, maxBasketSize = 8L).count()
    }

    timed(s"chi-square + KS drift over two ${n}-row snapshots") {
      val a = spark.range(n)
        .select(pmod(hash(col("id"), lit(1)), lit(1000L)).as("v"))
      val b = spark.range(n)
        .select((pmod(hash(col("id"), lit(2)), lit(1000L)) +
          when(col("id") % 5 === 0, 30L).otherwise(0L)).as("v"))
      val chi = Drift.chiSquareBuckets(a, b, "v", width = 10.0,
        numBuckets = 100)
      val ks = Drift.ksStatistic(a, b, "v")
      val c = chi.agg(sum("contrib_x1e6")).collect()(0).getLong(0)
      val d = ks.collect()(0).getLong(0)
      println(s"  chi2_x1e6 = $c, ks d_num = $d")
      2L
    }

    timed(s"AMS F2 sketch (16 polys) + exact F2 over $n rows") {
      val items = math.max(n / 50, 100L)
      val xs = spark.range(n).repartition(64)
        .select(expr(s"cast(pow((hash(id, 9) & 2147483647) / " +
          s"2147483648.0, 2) * $items as long)").as("x"))
        .localCheckpoint()
      val est = Sketches.f2FromState(
        Sketches.f2SketchState(xs, "x", 16)).collect()(0).getLong(0)
      val exact = Sketches.f2Exact(xs, "x").collect()(0)
        .getDecimal(0).longValueExact()
      println(f"  est = $est, exact = $exact, " +
        f"ratio = ${est.toDouble / exact}%.3f")
      1L
    }

    timed(s"k-anonymity + t-closeness over $n rows") {
      // 100×50 quasi grid, 10-value sensitive domain — domain-sized
      // aggregates and a 50k-row grid however large n grows
      val df = spark.range(n).repartition(64).select(
        pmod(hash(col("id"), lit(3)), lit(100L)).as("region"),
        pmod(hash(col("id"), lit(4)), lit(50L)).as("band"),
        pmod(hash(col("id"), lit(5)), lit(10L)).as("sal"))
        .localCheckpoint()
      val kBad = graft.pipeline.Privacy
        .kAnonymityGroups(df, Seq("region", "band"), k = n / 10000)
        .where(col("is_k_anon") === 0).count()
      val tFar = graft.pipeline.Privacy
        .tClosenessGroups(df, Seq("region", "band"), "sal",
          tX1e6 = 20000L)
        .where(col("is_t_close") === 0).count()
      println(s"  under-k groups = $kBad, far groups = $tFar")
      kBad + tFar
    }

    timed(s"discovered length-3 paths over $n events") {
      val users = math.max(n / 100, 10L)
      val ev = spark.range(n).repartition(64).select(
        pmod(col("id"), lit(users)).as("user_id"),
        col("id").as("ts"), col("id").as("event_id"),
        concat(lit("t"), pmod(hash(col("id"), lit(11)), lit(8L)))
          .as("event_type"))
      graft.streaming.EventPipeline.pathCounts(ev, k = 25).count()
    }

    timed(s"association rules over $n basket items") {
      val items = math.max(n / 50, 100L)
      val bi = spark.range(n).repartition(64)
        .select((col("id") / 5).cast("long").as("basket"),
          expr(s"cast(pow((hash(id, 7) & 2147483647) / 2147483648.0, 2)" +
            s" * $items as long)").as("item"))
        .localCheckpoint()
      Graph.associationRules(bi, "basket", "item",
        minCount = 2L, maxBasketSize = 8L).count()
    }

    timed(s"shot segmentation over $n media clips") {
      // ~256-byte payloads whose bytes derive from (id, position)
      // hashes — every clip gets a few genuine frame-sum jumps
      val media = spark.range(n).repartition(64)
        .select(col("id").as("media_id"),
          expr("cast(concat_ws('', transform(sequence(1, 16), " +
            "i -> repeat(char(97 + pmod(hash(id, i), 20)), 16))) " +
            "as binary)").as("payload"))
        .localCheckpoint()
      graft.pipeline.Multimodal.shotSummary(media, frameBytes = 16,
          stride = 1, minJump = 100L)
        .agg(sum(col("n_shots"))).collect()(0).getLong(0)
    }

    timed(s"fuzzy search over $n synthetic docs") {
      // 20-token docs over a 50k-word vocabulary; queries carry
      // deletion typos so the expansion has real work to do
      val docs = spark.range(n).repartition(64)
        .select(col("id").as("doc_id"),
          expr("concat_ws(' ', transform(sequence(1, 20), " +
            "i -> concat('w', pmod(hash(id, i), 50000))))").as("text"))
        .localCheckpoint()
      val post = graft.query.TextSearch
        .postings(docs, "doc_id", "text").localCheckpoint()
      graft.query.TextSearch.fuzzySearch(post,
          post.select("tok").distinct(), "doc_id",
          Seq("w1234", "w777"), maxDist = 1)
        .limit(50).count()
    }

    timed(s"golden-record survivorship over $n cluster rows") {
      // n/4 entities × 4 records, two fields with hash-planted nulls
      val df = spark.range(n).repartition(64).select(
        (col("id") / 4).cast("long").as("entity"),
        col("id").as("rec_ts"),
        when(pmod(hash(col("id"), lit(1)), lit(3)) === 0, lit(null))
          .otherwise(pmod(col("id"), lit(1000L))).as("f1"),
        when(pmod(hash(col("id"), lit(2)), lit(3)) === 0, lit(null))
          .otherwise(concat(lit("v"), pmod(col("id"), lit(97L))))
          .as("f2"))
        .localCheckpoint()
      graft.pipeline.Dedup.goldenRecords(df, "entity",
        Seq("rec_ts"), Seq("f1", "f2")).count()
    }

    timed(s"fixed-width render + parse round trip over $n records") {
      val layout = Seq(
        FixedWidthCorpus.Field("id", 1, 12, numeric = true),
        FixedWidthCorpus.Field("tag", 13, 8, numeric = false),
        FixedWidthCorpus.Field("qty", 21, 6, numeric = true))
      val tmp = java.nio.file.Files
        .createTempDirectory("fw_probe").toString
      val df = spark.range(n).repartition(64).select(col("id"),
        concat(lit("t"), pmod(col("id"), lit(97L))).as("tag"),
        pmod(col("id") * 31, lit(100000L)).as("qty"))
      FixedWidthCorpus.render(df, layout).write
        .mode("overwrite").text(s"$tmp/d")
      val (clean, q) = FixedWidthCorpus.read(spark, s"$tmp/d", layout)
      val sums = clean.agg(sum("qty"), count(lit(1))).collect()(0)
      println(s"  sum_qty = ${sums.getLong(0)}, quarantined = ${q.count()}")
      sums.getLong(1)
    }

    spark.stop()
  }
}
