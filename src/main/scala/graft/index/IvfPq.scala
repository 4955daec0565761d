package graft.index

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** IVF+PQ index configuration — mirrors the reference's builder knobs
  * (reference/src/db/build.rs:44-70: defaults P=10, D=8, C=16) plus the
  * k-means bounds (reference/src/kmeans.rs:114: ≤100 rounds; kmeans.rs:24-34:
  * ε-convergence). MLlib's tol is center-movement based like the
  * reference's normalized max-displacement — close enough in spirit, and
  * documented as an accepted divergence (SURVEY.md §7).
  */
case class IvfPqConfig(
    numPartitions: Int = 10, // P — IVF cells
    numDivisions: Int = 8,   // D — PQ subvector divisions
    numCodes: Int = 16,      // C — PQ codes per division
    maxIter: Int = 100,
    tol: Double = 1e-6,
    seed: Long = 42L,
    // k-means TRAINING sample cap, per centroid (standard IVF/PQ
    // practice at scale — e.g. FAISS's max_points_per_centroid=256:
    // centroids/codebooks are estimated from k·cap points, then ALL
    // vectors are assigned/encoded in single passes). 0 trains on
    // everything, like the reference's in-memory loop — which cannot
    // be the 100 TB path: an iterative fit over the full corpus scans
    // it maxIter times. Quality loss is negligible once cap ≫ the
    // per-centroid d.o.f.; small inputs are unaffected (cap ≥ n).
    trainPointsPerCentroid: Int = 256,
    // init for the D codebook fits: "random" (FAISS's PQ practice —
    // sampled training points as initial centroids) skips k-means||'s
    // multi-pass seeding, which costs several extra scans per fit and
    // buys little for 256 fine codes refined over maxIter rounds anyway.
    // The coarse IVF fit keeps k-means|| (few centroids, quality
    // matters for partition balance).
    pqInitMode: String = "random")

/** Driver-side index artifacts. Deliberately tiny (P·N + D·C·(N/D) floats ≈
  * a few MB even at README scale P=100, D=12, C=256, N=1536) so they are
  * broadcast, never shuffled — the same insight the reference exploits by
  * keeping centroids/codebooks in memory (reference/src/db/stored.rs:48-56).
  */
case class IvfPqModel(
    config: IvfPqConfig,
    dim: Int,
    partitionCentroids: Array[Array[Double]],     // P × N
    codebooks: Array[Array[Array[Double]]]) {     // D × C × (N/D)
  def subDim: Int = dim / config.numDivisions
}

/** Builds an IVF+PQ index as DataFrame transformations + MLlib k-means fits
  * — the Spark-first re-expression of the reference's 4-stage build
  * (reference/src/db/build.rs:78-129: ids → partition → divide → quantize).
  *
  * Where the reference is a single-threaded loop over an in-memory
  * `BlockVectorSet` (906 s for 100k×1536, README.md:139), this build is a
  * handful of cluster-parallel jobs:
  *   1. ids         — provided by the caller (deterministic keys)
  *   2. IVF         — KMeans(P) fit + one projection adding (partition,
  *                    residual) via a broadcast of P centroids
  *   3. divide + PQ — D independent KMeans(C) fits over `slice(residual)`;
  *                    independent ⇒ submitted concurrently
  *   4. encode      — one projection adding `codes: array<int>` (D codes)
  *
  * The only shuffles are inside the k-means fits (per-cluster means) and
  * the final `partitionBy("partition")` write; vectors are never shuffled
  * otherwise. At 100 TB the write produces one directory per IVF cell,
  * giving file-level partition pruning at query time — the moral
  * equivalent of the reference's per-partition files
  * (reference/src/db/build/proto.rs:59-62).
  */
object IvfPqBuilder {

  /** Fit the index over `df(idCol, vecCol: array<float>)`.
    * Returns (model, encoded) where encoded = (id, partition, codes,
    * residual) — residual retained for PQ-error inspection and rebuilds.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
          config: IvfPqConfig): (IvfPqModel, DataFrame) =
    fit(df, idCol, vecCol, dim, config, _ => ())

  /** As [[fit]], with a stage-event callback — the analogue of the
    * reference's BuildEvent instrumentation (db/build.rs:132-153). */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
          config: IvfPqConfig, log: String => Unit): (IvfPqModel, DataFrame) = {
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      log(f"$name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    require(dim % config.numDivisions == 0,
      s"dim $dim must divide into ${config.numDivisions} divisions") // vector.rs:162-168
    val subDim = dim / config.numDivisions

    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("features", array_to_vector(col("vec")))

    // training sample: k-means estimates k centroids; it does not need
    // every row, and at corpus scale it MUST not see every row (maxIter
    // full scans). Assignment/encoding below still cover all vectors.
    val nRows = if (config.trainPointsPerCentroid > 0) base.count() else 0L
    def trainSample(of: DataFrame, k: Int): DataFrame = {
      val cap = k.toLong * config.trainPointsPerCentroid
      if (config.trainPointsPerCentroid > 0 && cap < nRows) {
        log(s"train-sample $cap of $nRows rows (k=$k)")
        of.sample(withReplacement = false, cap.toDouble / nRows, config.seed)
      } else of
    }

    // --- stage 2: coarse IVF k-means (reference partitions.rs:96-143) ---
    val coarse = timed("coarse-kmeans")(
      newKMeans(config, config.numPartitions)
        .fit(trainSample(base, config.numPartitions)))
    // rounds actually used: < maxIter means the tol-based stop fired,
    // i.e. the fit converged like the reference's ε-stop (kmeans.rs:24-34)
    log(s"coarse-kmeans rounds=${coarse.summary.numIter}/${config.maxIter}")
    val centroids = coarse.clusterCenters.map(_.toArray)

    // partition assignment + residual v − centroid[p] in one projection;
    // the P×N centroid table rides along as a codegen literal, no join.
    // Residuals are f32, as in the reference (partitions.rs:119-143) —
    // half the cache footprint and PQ scan traffic of doubles.
    val centroidLit = typedlit(centroids.map(_.toSeq).toSeq)
    val assigned = coarse.transform(base)
      .withColumnRenamed("prediction", "partition")
      .withColumn("residual",
        zip_with(col("vec"), element_at(centroidLit, col("partition") + 1),
          (x, c) => (x.cast("double") - c).cast("float")))
      .select(col("id"), col("partition"), col("residual"))
      .cache()
    timed("materialize-residuals")(assigned.count())

    // --- stage 3: D PQ codebooks over residual slices (db/build.rs:107-118).
    // Each division trains over its OWN narrow cached relation (one
    // subDim-dim vector column, ~subDim·8 B/row) — an iteration scans
    // megabytes, not the full residual table; fits are independent, so
    // they are submitted concurrently and the scheduler interleaves them.
    // One shared training sample feeds all D fits (C·cap rows). Each
    // fit's relation gets parallelism/D partitions, not `parallelism`:
    // the D fits run concurrently, so the CLUSTER still sees ~parallelism
    // tasks per round-wave, while per-fit job overhead (task launch,
    // round barriers) drops D-fold — the fits are overhead-bound, not
    // flop-bound, at C·cap training rows.
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val subParts = math.max(2, parallelism / config.numDivisions)
    val pqTrain = trainSample(assigned, config.numCodes)
    val subDfs = (0 until config.numDivisions).map { d =>
      pqTrain.select(
        array_to_vector(slice(col("residual"), d * subDim + 1, subDim))
          .as("features"))
        .coalesce(subParts)
        .cache()
    }
    val pqModels: Array[KMeansModel] = timed("pq-kmeans-all") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      Await.result(
        Future.sequence(subDfs.toList.map { sub =>
          Future(newKMeans(config, config.numCodes)
            .setInitMode(config.pqInitMode).fit(sub))
        }), Duration.Inf).toArray
    }
    subDfs.foreach(_.unpersist(blocking = false))
    log(s"pq-kmeans rounds=${pqModels.map(_.summary.numIter).min}.." +
      s"${pqModels.map(_.summary.numIter).max}/${config.maxIter}")
    val codebooks = pqModels.map(_.clusterCenters.map(_.toArray))

    // --- stage 4: encode — D assignments gathered into one array<int>
    // column (reference Partition::new, db/build.rs:446-483); one pass
    // over the cached residuals computing all D slices + predictions.
    val withSubs = (0 until config.numDivisions).foldLeft(assigned) { (acc, d) =>
      acc.withColumn(s"sub_$d",
        array_to_vector(slice(col("residual"), d * subDim + 1, subDim)))
    }
    val encodedAll = pqModels.zipWithIndex.foldLeft(withSubs) {
      case (acc, (m, d)) =>
        m.setFeaturesCol(s"sub_$d").setPredictionCol(s"code_$d").transform(acc)
    }
    val encoded = encodedAll.select(
      col("id"), col("partition"),
      array((0 until config.numDivisions).map(d => col(s"code_$d")): _*).as("codes"),
      col("residual"))

    (IvfPqModel(config, dim, centroids, codebooks), encoded)
  }

  private def newKMeans(config: IvfPqConfig, k: Int,
                        features: String = "features",
                        prediction: String = "prediction"): KMeans =
    new KMeans()
      .setK(k)
      .setSeed(config.seed)
      .setMaxIter(config.maxIter)
      .setTol(config.tol)
      .setFeaturesCol(features)
      .setPredictionCol(prediction)

  /** Assign fresh ids to an id-less vector table — the reference's UUID
    * assignment when vectors arrive without keys (db/build.rs:86-91).
    * `uuid()` draws RFC-4122 v4 ids per row (non-deterministic across
    * runs, like the reference); pass deterministic = true to derive
    * stable ids from a total order instead (the replayable-pipeline
    * default everywhere else in this library). */
  def withAssignedIds(df: DataFrame, idCol: String = "id",
                      deterministic: Boolean = false): DataFrame =
    if (deterministic)
      df.withColumn(idCol, monotonically_increasing_id())
    else
      df.withColumn(idCol, expr("uuid()"))

  /** Persist the index: codes partitioned by IVF cell (→ partition-pruned
    * scans, the analogue of reference per-partition files), centroids +
    * codebooks as small parquet, manifest as JSON — replacing the
    * reference's content-addressed zlib protobuf store (io.rs:242-300)
    * with parquet codecs + checksums.
    *
    * Documented divergence from the reference's f32-only persistence
    * (protos/database.proto:66-74): centroids/codebooks stay f64 here.
    * They are KBs against a codes table that dominates storage by orders
    * of magnitude, and keeping them f64 makes save/load BIT-EXACT — a
    * loaded index answers queries identically to the in-memory one (the
    * ann_ivfpq_stored invariant). Residuals, the only per-vector floats,
    * are f32 like the reference's. */
  def save(model: IvfPqModel, encoded: DataFrame, path: String): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    encoded.select("id", "partition", "codes")
      .write.mode(SaveMode.Overwrite).partitionBy("partition")
      .parquet(s"$path/codes")
    model.partitionCentroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("partition", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    model.codebooks.zipWithIndex.flatMap { case (cb, d) =>
      cb.zipWithIndex.map { case (cv, c) => (d, c, cv.toSeq) }
    }.toSeq.toDF("division", "code", "code_vector")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/codebooks")
    val m = model
    val manifest =
      s"""{"vector_size":${m.dim},"num_partitions":${m.config.numPartitions},
         |"num_divisions":${m.config.numDivisions},"num_codes":${m.config.numCodes}}"""
        .stripMargin.replace("\n", "")
    // through the Hadoop filesystem of the path, not java.nio — the index
    // must round-trip on hdfs://, s3a://, etc. like every other artifact
    val mPath = new org.apache.hadoop.fs.Path(s"$path/manifest.json")
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(mPath, true)
    try out.write(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load index artifacts back; validates the same invariants the
    * reference checks on load (db/stored.rs:659-722: shape cross-checks). */
  def load(spark: SparkSession, path: String): (IvfPqModel, DataFrame) = {
    val mPath = new org.apache.hadoop.fs.Path(s"$path/manifest.json")
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(mPath)
    val manifestStr =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val manifest = ujsonLite(manifestStr)
    val dim = manifest("vector_size")
    val p = manifest("num_partitions")
    val d = manifest("num_divisions")
    val c = manifest("num_codes")
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("partition").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
    require(centroids.length == p, s"expected $p centroids, got ${centroids.length}")
    require(centroids.forall(_.length == dim), "centroid dim mismatch")
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .orderBy("division", "code").collect()
    val codebooks = cbRows.groupBy(_.getInt(0)).toArray.sortBy(_._1).map {
      case (_, rows) => rows.sortBy(_.getInt(1))
        .map(r => r.getSeq[Double](2).toArray)
    }
    require(codebooks.length == d && codebooks.forall(_.length == c),
      "codebook shape mismatch")
    val model = IvfPqModel(
      IvfPqConfig(numPartitions = p, numDivisions = d, numCodes = c), dim,
      centroids, codebooks)
    (model, spark.read.parquet(s"$path/codes"))
  }

  /** Minimal flat-JSON int-field extractor (manifest only; avoids deps). */
  private def ujsonLite(s: String): Map[String, Int] =
    """"(\w+)"\s*:\s*(\d+)""".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toInt).toMap
}
