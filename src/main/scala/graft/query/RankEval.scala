package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: scores a ranked result relation
  * against a relevance (ground-truth) relation — the harness that turns
  * the ANN/BM25/hybrid operators' output into precision/recall/MRR
  * numbers a pipeline can gate deployments on (the per-query twin of
  * the nprobe recall curve in [[Calibrate]]).
  *
  * Contract: `results` is (qid, doc_id, rank) — ranks 1..k per query,
  * as every top-k operator here emits; `truth` is (qid, doc_id), one
  * row per relevant document. Queries with no result rows do not
  * appear (there is nothing to score); a query with no TRUTH rows
  * scores n_relevant = 0, n_hits = 0.
  *
  * Plan shape: one equi-join results⋈truth on (qid, doc_id) + two
  * qid-keyed aggregates — shuffles bounded by k·|queries| and |truth|,
  * never a corpus scan.
  *
  * [[perQuery]] is integer-exact (counts and ranks only) so the gate
  * entry hash-compares it; [[summary]] derives the double-valued means
  * (P@k, recall, MRR, hit-rate) for API use, spec-covered.
  */
object RankEval {

  /** Per-query counters: (qid, n_retrieved, n_relevant, n_hits,
    * first_hit_rank) with first_hit_rank = 0 when no relevant document
    * was retrieved. */
  def perQuery(results: DataFrame, truth: DataFrame): DataFrame = {
    // relevance is a SET: dedupe defensively so a truth relation with
    // repeated (qid, doc_id) rows can't inflate hits via join fan-out
    val t = truth.select(col("qid"), col("doc_id")).distinct()
    val marked = results.join(t.withColumn("rel", lit(1L)),
      Seq("qid", "doc_id"), "left")
    val relCnt = t.groupBy("qid").agg(count(lit(1)).as("n_relevant"))
    marked.groupBy("qid")
      .agg(count(lit(1)).as("n_retrieved"),
        coalesce(sum(col("rel")), lit(0L)).as("n_hits"),
        coalesce(min(when(col("rel") === 1, col("rank"))), lit(0L))
          .as("first_hit_rank"))
      .join(relCnt, Seq("qid"), "left")
      .select(col("qid"), col("n_retrieved"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        col("n_hits"), col("first_hit_rank"))
  }

  /** Corpus-level means over [[perQuery]] output: one row with
    * n_queries, mean precision@k (n_hits/n_retrieved), mean recall
    * (n_hits/n_relevant, queries with n_relevant = 0 excluded from the
    * recall mean), MRR (1/first_hit_rank, 0 when no hit), and hit_rate
    * (fraction of queries with ≥1 hit). */
  def summary(perQueryDf: DataFrame): DataFrame =
    perQueryDf.agg(
      count(lit(1)).as("n_queries"),
      avg(col("n_hits").cast("double") / col("n_retrieved"))
        .as("precision"),
      avg(when(col("n_relevant") > 0,
        col("n_hits").cast("double") / col("n_relevant"))).as("recall"),
      avg(when(col("first_hit_rank") > 0,
        lit(1.0) / col("first_hit_rank")).otherwise(0.0)).as("mrr"),
      avg(when(col("n_hits") > 0, 1.0).otherwise(0.0)).as("hit_rate"))
}
