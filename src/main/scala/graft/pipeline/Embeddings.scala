package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column operators for corpus QC and class prototypes.
  *
  * Scale shape: everything here runs posexplode → map-side-combined
  * groupBy on (group, position) — the shuffle carries one partial row
  * per (group, pos) per upstream partition (groups·dim rows), never the
  * vectors themselves.
  */
object Embeddings {

  /** Model-free document embedding by the feature-hashing trick
    * (Weinberger et al. 2009; [[graft.functions.Kernels.hashEmbedF]]):
    * (doc_id, embedding: array<float> of per-bucket token counts). One
    * narrow codegen projection — no vocabulary table, no training, no
    * shuffle — so raw text plugs straight into the exact-kNN and IVF
    * index family (cosine over count vectors = TF similarity). The
    * invariant Σ_buckets v = token count holds exactly, which the gate
    * entry checks cross-engine. */
  def hashEmbed(docs: DataFrame, dim: Int): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.FastFunctions.hashEmbedF(
        TextAnalysis.tokens(col("text")), dim).as("embedding"))

  /** L2-normalize a float-vector column in place: every non-zero vector
    * lands on the unit sphere (zero vectors pass through unchanged —
    * dividing by a zero norm would NaN the row). The norm is computed
    * ONCE as its own projection column before the per-element divide —
    * inlining it inside the transform lambda would re-evaluate the
    * O(dim) aggregate per element (the measured O(dim²) trap noted at
    * the embed_hash_knn entry). On the unit sphere ‖q−x‖² = 2−2·cos(q,x),
    * so the L2 index family ([[graft.index.IvfPqBuilder]] etc.) answers
    * COSINE queries with no new machinery — see AnnQuery's cosine notes. */
  def l2Normalized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__graft_nrm",
        graft.functions.VectorFunctions.l2Norm(col(vecCol)))
      .withColumn(vecCol,
        when(col("__graft_nrm") === 0.0, col(vecCol))
          .otherwise(transform(col(vecCol),
            x => (x.cast("double") / col("__graft_nrm")).cast("float"))))
      .drop("__graft_nrm")

  /** MIPS→L2 augmentation (Bachrach et al., RecSys'14; the ALSH family):
    * append one coordinate s = √(M² − ‖x‖²) where M = max corpus norm,
    * so for a query padded with 0, ‖[q,0] − [x,s]‖² = ‖q‖² + M² − 2·q·x
    * — monotone DECREASING in the inner product. The unchanged L2 index
    * family then answers maximum-inner-product queries, completing the
    * metric triple (L2 native, cosine via [[l2Normalized]], IP here).
    * Returns (augmented df, M). The augmented geometry compresses the
    * similarity range (known recall caveat of the reduction — points
    * with small norms cluster near the sphere's pole), so calibrate
    * nprobe against the exact MIPS oracle as with any index. M comes
    * from one aggregate; the augmentation itself is a narrow projection
    * with the norm as its own column (the O(dim²) lambda trap). */
  def mipsAugmented(df: DataFrame, vecCol: String): (DataFrame, Double) = {
    val m2 = df.agg(max(graft.functions.VectorFunctions.normSq(col(vecCol))))
      .head.getDouble(0)
    val aug = df
      .withColumn("__graft_nsq",
        graft.functions.VectorFunctions.normSq(col(vecCol)))
      .withColumn(vecCol, concat(col(vecCol),
        array(sqrt(greatest(lit(m2) - col("__graft_nsq"), lit(0.0)))
          .cast("float"))))
      .drop("__graft_nsq")
    (aug, math.sqrt(m2))
  }

  /** Matryoshka truncation evaluation (Kusupati et al. 2022,
    * arXiv:2205.13147): how much retrieval quality survives when the
    * embedding is truncated to its first d dims — the operating curve
    * for choosing a cheap prefix dim at serving time. For each d in
    * `dims`, the exact top-k per query over PREFIX-SLICED vectors is
    * compared against the full-dim top-k; output
    * (dim, n_queries, n_hits, recall_bp), integers only. Each dim is
    * one [[graft.query.ExactKnn.batchTopK]] pass (broadcast queries,
    * k·|queries| shuffle rows) over a NARROWER slice — the scan cost
    * itself shrinks with d.
    *
    * The reference ranking is the top-k at `fullDim` — the embedding's
    * TRUE dimension. When `fullDim` is omitted (0), `dims.max` is used
    * and is assumed to be the full dimension; pass `fullDim` explicitly
    * when evaluating a dims grid that stops short of it, otherwise the
    * curve would be measured against a truncated reference. */
  def matryoshkaRecall(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dims: Seq[Int], k: Int, fullDim: Int = 0): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ > 0), s"bad dims: $dims")
    val full = if (fullDim > 0) fullDim else dims.max
    require(full >= dims.max,
      s"fullDim $full is below dims.max ${dims.max} — the reference " +
        "ranking must use at least every evaluated prefix")
    def topAt(d: Int): DataFrame =
      graft.query.ExactKnn.batchTopK(
        df.withColumn(vecCol, slice(col(vecCol), 1, d)), vecCol, idCol,
        queries.withColumn(qvecCol, slice(col(qvecCol), 1, d)),
        qidCol, qvecCol, k)
        .select(col(qidCol).as("qid"), col(idCol).as("id"))
    val ref = topAt(full).withColumn("is_hit", lit(1L))
    val perDim = dims.map(d => topAt(d).withColumn("dim", lit(d.toLong)))
      .reduce(_ unionByName _)
    perDim.join(ref, Seq("qid", "id"), "left")
      .groupBy("dim")
      .agg(countDistinct(col("qid")).as("n_queries"),
        coalesce(sum(coalesce(col("is_hit"), lit(0L))), lit(0L))
          .as("n_hits"))
      .withColumn("recall_bp", expr(s"n_hits * 10000 div (n_queries * $k)"))
      .orderBy("dim")
  }

  /** Per-group mean vector (class centroid / prototype), re-assembled in
    * position order: (group, centroid: array<double>, n_vectors). */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("grp", "pos")
      .agg(avg(col("x").cast("double")).as("m"), count(lit(1)).as("n"))
      .groupBy("grp")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"),
        max(col("n")).as("n_vectors"))
      .withColumnRenamed("grp", groupCol)

  /** The oracle-exact view of the same aggregation: per (group, pos),
    * Σ floor(x·1000) and the count — each element is quantized ONCE
    * (deterministic per input bits), then integer sums commute exactly,
    * so any SQL engine reproduces the result bit-for-bit, unlike a
    * float mean whose summation order is engine- and partitioning-
    * dependent. mean_milli ≈ sum_milli / cnt. */
  def centroidSumsMilli(df: DataFrame, groupCol: String,
                        vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("grp", "pos")
      .agg(sum(floor(col("x").cast("double") * 1000).cast("long"))
        .as("sum_milli"), count(lit(1)).as("cnt"))
      .select(col("grp").as(groupCol), col("pos").cast("long").as("pos"),
        col("sum_milli"), col("cnt"))

  // ------------------------------------------------------------------ PCA

  /** Principal components of the embedding corpus. `mean`/`eigenvalues`
    * are full-dimension (eigenvalues descending, POPULATION covariance);
    * `components` holds the top-k orthonormal eigenvectors row-major;
    * `trace` = tr(C) = Σ all d eigenvalues (the total variance). */
  final case class PcaModel(dim: Int, n: Long, trace: Double,
                            mean: Array[Double],
                            eigenvalues: Array[Double],
                            components: Array[Array[Double]])

  /** Fit PCA in ONE distributed pass + a driver-side 64×64 eigensolve —
    * the dimensionality-reduction stage (OPQ/whitening prep) of an
    * embedding pipeline. The pass ships one `momentsUpper` partial per
    * row through posexplode + map-side-combined groupBy: the shuffle
    * carries (d + d(d+1)/2) × partitions fixed-width rows — for d=64
    * that is 2,144 doubles per upstream partition, independent of corpus
    * size, the same scale shape as the k-means training-sample collects
    * (estimation driver-side, corpus-sized work distributed). The
    * eigensolve is a cyclic Jacobi over the d×d covariance — O(d³·
    * sweeps) on 2,144 driver-resident doubles. */
  def pcaFit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val rows = df
      .select(posexplode(
        graft.functions.FastFunctions.momentsUpper(col(vecCol)))
        .as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
    require(rows.nonEmpty, "pcaFit over an empty corpus")
    val n = rows.head.getLong(2)
    val sums = new Array[Double](rows.length)
    rows.foreach(r => sums(r.getInt(0)) = r.getDouble(1))
    // rows.length = d + d(d+1)/2 ⇒ d from the quadratic formula
    val d = ((math.sqrt(9.0 + 8.0 * rows.length) - 3.0) / 2.0).round.toInt
    require(d + d * (d + 1) / 2 == rows.length,
      s"inconsistent moment vector length ${rows.length}")
    require(k >= 1 && k <= d, s"need 1 <= k <= $d, got $k")
    val mean = Array.tabulate(d)(i => sums(i) / n)
    val cov = Array.ofDim[Double](d, d)
    var idx = d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = sums(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        idx += 1
        j += 1
      }
      i += 1
    }
    val trace = (0 until d).map(t => cov(t)(t)).sum
    val (evals, evecs) = jacobiEig(cov)
    PcaModel(d, n, trace, mean, evals, evecs.take(k))
  }

  /** Project embeddings onto the model's top-k components, centered:
    * proj_r = c_r · (v − μ) = c_r·v − c_r·μ. One `matvecRows` kernel
    * call per row against the k×d plan literal plus a k-length offset
    * subtraction — a narrow codegen projection, no shuffle, no per-row
    * centering pass. */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 model: PcaModel): DataFrame = {
    import graft.functions.FastFunctions.{litDoubles, matvecRowsF}
    val flat = litDoubles(model.components.flatten)
    val offsets = litDoubles(model.components.map(r =>
      (0 until model.dim).map(t => r(t) * model.mean(t)).sum))
    df.select(col(idCol),
      zip_with(matvecRowsF(col(vecCol), flat), offsets,
        (p, o) => p - o).as("proj"))
  }

  /** PCA whitening: the projection with each component scaled by
    * 1/√(λ+eps), so the output coordinates have (population) unit
    * variance and zero cross-covariance — the decorrelation step before
    * product quantization (OPQ-style) or as embedding normalization.
    * Same single codegen kernel call per row as [[pcaProject]]; the
    * scaling folds into the literal matrix, costing nothing at run time. */
  def pcaWhiten(df: DataFrame, idCol: String, vecCol: String,
                model: PcaModel, eps: Double = 1e-9): DataFrame = {
    val scaled = model.copy(components = model.components.zipWithIndex.map {
      case (row, i) => row.map(_ / math.sqrt(model.eigenvalues(i) + eps))
    })
    pcaProject(df, idCol, vecCol, scaled)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub & Van
    * Loan §8.5 — the textbook algorithm): rotate away each off-diagonal
    * entry per sweep until the off-diagonal mass vanishes. Returns
    * (eigenvalues descending, matching unit eigenvectors as rows).
    * Deterministic, O(d³) per sweep — for the d ≤ a-few-hundred matrices
    * a PCA over embeddings produces, the driver solve is microseconds
    * next to the corpus pass. */
  private[graft] def jacobiEig(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var frob2 = 0.0
    for (i <- 0 until d; j <- 0 until d) frob2 += a(i)(j) * a(i)(j)
    val tol = 1e-28 * math.max(frob2, Double.MinPositiveValue)
    def offDiag2(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      s
    }
    var sweep = 0
    while (sweep < 64 && offDiag2() > tol) {
      for (p <- 0 until d; q <- p + 1 until d if a(p)(q) != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // stable tan(φ) of the annihilating rotation; θ=0 ⇒ 45°
        val t =
          if (theta == 0.0) 1.0
          else math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var i = 0
        while (i < d) { // A ← JᵀAJ, both sides
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
          i += 1
        }
        i = 0
        while (i < d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
          i += 1
        }
        i = 0
        while (i < d) { // eigenvector accumulation
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
          i += 1
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(j => Array.tabulate(d)(i => v(i)(j))).toArray)
  }
}
