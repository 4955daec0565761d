package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * regression check a recurring ingest runs before a new crawl replaces
  * the old one ("did the length/quality distribution shift?"), using the
  * population stability index over a FIXED bucketing:
  *
  *   PSI = Σ_buckets (p_new − p_old) · ln(p_new / p_old)
  *
  * with Laplace-smoothed shares p = (c+1)/(n+B) so empty buckets
  * contribute finitely and deterministically (no engine-specific ±∞ or
  * epsilon conventions). Rule-of-thumb thresholds: < 0.1 stable,
  * 0.1-0.25 moderate shift, > 0.25 investigate.
  *
  * The bucketing is caller-fixed integer arithmetic (a pure projection),
  * so the operator is two map-side-combining aggregates of ≤ B groups
  * each, one B-row outer join, and a 1-row reduction — nothing scales
  * with the corpus but the scans.
  */
object Drift {

  /** Fixed-width bucket id: floor(value / width), clamped to
    * [0, numBuckets). Integer-deterministic for any engine. */
  def bucketOf(value: Column, width: Double, numBuckets: Int): Column =
    least(greatest(floor(value / width), lit(0.0)), lit(numBuckets - 1.0))
      .cast("long")

  /** Per-bucket counts of both snapshots (empty buckets present with
    * zeros) plus each bucket's smoothed PSI contribution ×10⁶ floor —
    * integer output, engine-exact. Contributions are never negative
    * ((Δp)·ln-ratio has matching factor signs), so drift localizes:
    * a nonzero row means mass moved in or out of THAT bucket. Output:
    * (bucket, n_old, n_new, contrib_x1e6; PSI total = Σ contrib). */
  def psiBuckets(old: DataFrame, cur: DataFrame, valueCol: String,
                 width: Double, numBuckets: Int): DataFrame =
    psiFromBucketed(
      old.select(bucketOf(col(valueCol), width, numBuckets).as("bucket")),
      cur.select(bucketOf(col(valueCol), width, numBuckets).as("bucket")),
      numBuckets)

  /** The PSI core over ALREADY-BUCKETED snapshots (a single `bucket`
    * column, ids in [0, numBuckets)) — shared by the scalar-column form
    * ([[psiBuckets]]) and the embedding-space form
    * ([[embeddingPsiBuckets]], cluster id as the bucket). */
  private def psiFromBucketed(old: DataFrame, cur: DataFrame,
                              numBuckets: Int): DataFrame =
    psiFromCellCounts(
      old.groupBy("bucket").agg(count(lit(1)).as("n")),
      cur.groupBy("bucket").agg(count(lit(1)).as("n")),
      numBuckets)

  /** The PSI core over PRE-AGGREGATED bucket histograms — two
    * (bucket, n) relations, ids in [0, numBuckets). This is the
    * mergeable-state entry point: bucket counts fold additively across
    * batches (the [[Sketches.mergeValueHistograms]] pattern), so a
    * persisted baseline histogram and a streaming-accumulated current
    * histogram compare without re-scanning either corpus — see
    * [[graft.streaming.StreamingDrift]]. */
  def psiFromCellCounts(oldCounts: DataFrame, curCounts: DataFrame,
                        numBuckets: Int): DataFrame = {
    val joined = alignedCells(oldCounts, curCounts, numBuckets)
    val totOld = sum(col("n_old")).over()
    val totNew = sum(col("n_new")).over()
    val b = lit(numBuckets.toDouble)
    val pOld = (col("n_old").cast("double") + lit(1.0)) /
      (totOld.cast("double") + b)
    val pNew = (col("n_new").cast("double") + lit(1.0)) /
      (totNew.cast("double") + b)
    joined
      .withColumn("contrib_x1e6",
        floor((pNew - pOld) * log(pNew / pOld) * lit(1e6)).cast("long"))
  }

  /** Full bucket list outer-joined against both histograms — every
    * bucket id in [0, numBuckets) present, missing counts as zeros.
    * Shared by the PSI and chi-square cores. */
  private def alignedCells(oldCounts: DataFrame, curCounts: DataFrame,
                           numBuckets: Int): DataFrame = {
    require(numBuckets >= 2, s"need >= 2 buckets, got $numBuckets")
    val spark = oldCounts.sparkSession
    import spark.implicits._
    val all = (0L until numBuckets.toLong).toDF("bucket")
    all
      .join(oldCounts.select(col("bucket"), col("n").as("n_old")),
        Seq("bucket"), "left")
      .join(curCounts.select(col("bucket"), col("n").as("n_new")),
        Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
  }

  /** One-row PSI summary: (psi_x1e6, n_old, n_new). */
  def psi(old: DataFrame, cur: DataFrame, valueCol: String,
          width: Double, numBuckets: Int): DataFrame =
    psiBuckets(old, cur, valueCol, width, numBuckets)
      .agg(sum(col("contrib_x1e6")).as("psi_x1e6"),
        sum(col("n_old")).as("n_old"), sum(col("n_new")).as("n_new"))

  /** Exact two-sample Kolmogorov–Smirnov statistic in integer
    * cross-multiplied form — the distribution-shape drift test PSI's
    * fixed buckets can miss (a shift smaller than a bucket width is
    * invisible to PSI but moves the ECDF gap). Values must be integral
    * (convert money to cents etc. first); NULLs are excluded.
    *
    * Output is ONE row: `d_num` = max over pooled observed values x of
    * |cumA(x)·n_b − cumB(x)·n_a| (so D = d_num / (n_a·n_b), but the
    * comparison and any threshold test stay in exact integers),
    * `n_a`, `n_b`, and `at_value` = the smallest x attaining the max.
    * Overflow bound: keep n_a·n_b below ~9e18 — beyond that feed
    * pre-aggregated histograms, the counts relation is the state.
    *
    * Scale shape: per-side value histograms (map-side combined,
    * value-domain-sized), one full-outer merge, one cumulative window
    * over the DOMAIN-sized relation (same documented single-partition
    * bound as [[Sketches.quantilesFromHistogram]]), and a bounded
    * top-1. The corpus is scanned once per side; nothing row-scale
    * shuffles. */
  def ksStatistic(a: DataFrame, b: DataFrame,
                  valueCol: String): DataFrame = {
    def hist(df: DataFrame) =
      df.where(col(valueCol).isNotNull)
        .select(col(valueCol).cast("long").as("x"))
        .groupBy("x").agg(count(lit(1)).as("n"))
    ksFromHistograms(hist(a), hist(b))
  }

  /** [[ksStatistic]] over PRE-AGGREGATED (x, n) value histograms —
    * the mergeable-state entry point (histograms fold additively
    * across batches and persist beside the corpus, the
    * [[Sketches.mergeValueHistograms]] pattern), so a stored baseline
    * compares against a streaming-accumulated current histogram
    * without re-scanning either corpus. */
  def ksFromHistograms(aHist: DataFrame, bHist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = aHist.select(col("x"), col("n").as("ca"))
      .join(bHist.select(col("x"), col("n").as("cb")), Seq("x"), "full")
      .select(col("x"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val w = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = merged.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    merged
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .crossJoin(broadcast(tot))
      .select(abs(col("cuma") * col("n_b") - col("cumb") * col("n_a"))
          .as("d_num"),
        col("n_a"), col("n_b"), col("x").as("at_value"))
      .orderBy(col("d_num").desc, col("at_value").asc)
      .limit(1)
  }

  // ----------------------------------------------- chi-square drift

  /** Pearson chi-square homogeneity test between two bucketed
    * snapshots — the third leg of the drift toolkit beside PSI
    * (smoothed, threshold-by-convention) and KS (shape-sensitive,
    * ordered domains): the classical test with a null distribution
    * (χ² with `nonzero_cells − 1` dof), and the right one for
    * NOMINAL buckets (language, source, cluster id) where an ECDF
    * is meaningless.
    *
    * Per-cell contribution in the algebraically reduced two-sample
    * form (both rows' (O−E)²/E terms folded): with cell counts (a, b)
    * and totals (n_a, n_b),
    *
    *   contrib = (a·n_b − b·n_a)² / (n_a · n_b · (a+b))
    *
    * The inner difference is computed in EXACT integer arithmetic
    * (keep per-cell count × opposite total below ~3e9·3e9 like
    * [[ksFromHistograms]]; beyond that, pre-scale the histograms),
    * then the single division chain runs in IEEE doubles with a fixed
    * association order so both engines produce the identical bit
    * pattern, floor-scaled ×1e6. Empty cells (a+b = 0) contribute 0.
    *
    * Same scale shape as the PSI core: the inputs are bucket
    * histograms (map-side combined, domain-sized), and those
    * histograms are ADDITIVELY MERGEABLE state — fold per-batch
    * counts and compare a stored baseline against a streaming
    * accumulation without re-scanning either corpus. */
  def chiSquareFromCellCounts(oldCounts: DataFrame, curCounts: DataFrame,
                              numBuckets: Int): DataFrame = {
    val joined = alignedCells(oldCounts, curCounts, numBuckets)
    val totOld = sum(col("n_old")).over()
    val totNew = sum(col("n_new")).over()
    // exact integer inner difference; one fixed-order double chain after
    val d = (col("n_old") * totNew - col("n_new") * totOld).cast("double")
    val cell = (col("n_old") + col("n_new")).cast("double")
    val contrib = floor(
      d * d / (totOld.cast("double") * totNew.cast("double")) / cell *
        lit(1e6)).cast("long")
    joined.withColumn("contrib_x1e6",
      when(col("n_old") + col("n_new") === 0L, lit(0L)).otherwise(contrib))
  }

  /** [[chiSquareFromCellCounts]] over raw value columns with the same
    * fixed-width bucketing as [[psiBuckets]]. */
  def chiSquareBuckets(old: DataFrame, cur: DataFrame, valueCol: String,
                       width: Double, numBuckets: Int): DataFrame =
    chiSquareFromCellCounts(
      old.select(bucketOf(col(valueCol), width, numBuckets).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n")),
      cur.select(bucketOf(col(valueCol), width, numBuckets).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n")),
      numBuckets)

  /** One-row chi-square summary: (chi2_x1e6, dof, n_old, n_new) with
    * dof = nonzero cells − 1 (cells empty on BOTH sides carry no
    * information and don't count against the null). */
  def chiSquare(old: DataFrame, cur: DataFrame, valueCol: String,
                width: Double, numBuckets: Int): DataFrame =
    chiSquareBuckets(old, cur, valueCol, width, numBuckets)
      .agg(sum(col("contrib_x1e6")).as("chi2_x1e6"),
        (sum((col("n_old") + col("n_new") > 0L).cast("long")) - lit(1L))
          .as("dof"),
        sum(col("n_old")).as("n_old"), sum(col("n_new")).as("n_new"))

  // -------------------------------------------- embedding-space drift

  /** EMBEDDING-space drift between two corpus snapshots: cluster-share
    * PSI over the cells of a fixed [[Clustering.ClusterModel]] — the
    * re-training trigger for semantic shift that no scalar column sees
    * (topic mix moved, vocabulary drifted, a crawl source changed its
    * content while lengths and quality scores stayed put).
    *
    * The model is the FIXED reference frame, fit ONCE on the old
    * snapshot (or loaded via [[Clustering.fromIvf]] from a production
    * index) and applied to both sides — refitting per comparison would
    * conflate drift with fit jitter. Each side costs one distributed
    * `nearestCentroidL2` projection (no join, no shuffle beyond the
    * k-row count aggregate), so the comparison is two corpus scans at
    * any scale. Output: one row per cell, [[psiBuckets]] columns. */
  def embeddingPsiBuckets(old: DataFrame, cur: DataFrame, vecCol: String,
                          model: Clustering.ClusterModel): DataFrame =
    psiFromBucketed(
      Clustering.assign(old, vecCol, model)
        .select(col("cluster").as("bucket")),
      Clustering.assign(cur, vecCol, model)
        .select(col("cluster").as("bucket")),
      model.k)

  /** One-row embedding-space PSI summary: (psi_x1e6, n_old, n_new). */
  def embeddingPsi(old: DataFrame, cur: DataFrame, vecCol: String,
                   model: Clustering.ClusterModel): DataFrame =
    embeddingPsiBuckets(old, cur, vecCol, model)
      .agg(sum(col("contrib_x1e6")).as("psi_x1e6"),
        sum(col("n_old")).as("n_old"), sum(col("n_new")).as("n_new"))
}
