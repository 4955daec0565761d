package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Clustering, Drift}

/** Streaming embedding-space drift: the continuous form of
  * [[graft.pipeline.Drift.embeddingPsi]] — monitor an INGEST STREAM's
  * semantic distribution against a frozen baseline corpus, cell by cell,
  * and read the PSI after any trigger.
  *
  * The decomposition mirrors the batch operator exactly, so the
  * streaming result is batch-identical (StreamingDriftSpec asserts it
  * trigger by trigger):
  *  - the cluster model is the FIXED reference frame (fit once on the
  *    baseline, or [[Clustering.fromIvf]] from a production index) —
  *    its centroid table rides the stream as a codegen literal, so
  *    [[assignCells]] is a STATELESS per-row projection, safe in any
  *    streaming mode;
  *  - per-batch cell histograms are (bucket, n) relations that merge
  *    ADDITIVELY ([[mergeCellCounts]] — the
  *    [[graft.pipeline.Sketches.mergeValueHistograms]] state shape), so
  *    the accumulated state is k rows however much stream has passed;
  *  - [[Drift.psiFromCellCounts]] compares the persisted baseline
  *    histogram against the accumulated state without re-scanning
  *    either corpus.
  *
  * At 100 TB the baseline histogram is computed once beside the corpus
  * (k rows, trivially persistable) and each trigger pays one stateless
  * projection + a k-group aggregate over ITS OWN batch only. */
object StreamingDrift {

  /** Baseline cell histogram (bucket, n) of the frozen snapshot —
    * compute once, persist beside the corpus. */
  def baselineCells(old: DataFrame, vecCol: String,
                    model: Clustering.ClusterModel): DataFrame =
    cellCounts(old, vecCol, model)

  /** Stateless per-row cell assignment (streaming-safe projection):
    * input + `bucket` (the model cell). */
  def assignCells(df: DataFrame, vecCol: String,
                  model: Clustering.ClusterModel): DataFrame =
    Clustering.assign(df, vecCol, model)
      .select(col("cluster").as("bucket"))

  /** Cell histogram (bucket, n) of one (micro)batch. */
  def cellCounts(batch: DataFrame, vecCol: String,
                 model: Clustering.ClusterModel): DataFrame =
    assignCells(batch, vecCol, model)
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** Additive merge of two cell histograms — the foreachBatch fold. */
  def mergeCellCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(sum(col("n")).as("n"))

  /** Per-cell PSI of the accumulated stream state against the baseline
    * histogram ([[Drift.psiBuckets]] columns). */
  def psiVsBaseline(baseline: DataFrame, accumulated: DataFrame,
                    model: Clustering.ClusterModel): DataFrame =
    Drift.psiFromCellCounts(baseline, accumulated, model.k)

  /** One-row summary (psi_x1e6, n_old, n_new) — the alerting value. */
  def psiSummary(baseline: DataFrame, accumulated: DataFrame,
                 model: Clustering.ClusterModel): DataFrame =
    psiVsBaseline(baseline, accumulated, model)
      .agg(sum(col("contrib_x1e6")).as("psi_x1e6"),
        sum(col("n_old")).as("n_old"), sum(col("n_new")).as("n_new"))

  /** Per-cell chi-square of the SAME accumulated state against the
    * baseline ([[Drift.chiSquareFromCellCounts]]) — the nominal-domain
    * test with a null distribution rides the identical mergeable
    * histogram, so a monitor maintains ONE state and reads PSI and
    * chi-square from it after any trigger. */
  def chiSquareVsBaseline(baseline: DataFrame, accumulated: DataFrame,
                          model: Clustering.ClusterModel): DataFrame =
    Drift.chiSquareFromCellCounts(baseline, accumulated, model.k)
}
