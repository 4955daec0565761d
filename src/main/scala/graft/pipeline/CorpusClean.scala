package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus cleaning deliverable: compose the
  * quality and dedup operators into one drop-decision relation — the
  * pipeline a data-curation run executes over raw documents before
  * tokenization.
  *
  * Stages run in fixed order, each over the previous stage's survivors
  * (so decisions are deterministic and every document is dropped for
  * exactly one reason):
  *   1. quality  — too few tokens or too stopword-heavy
  *      ([[TextAnalysis.qualitySignals]]; integer thresholds);
  *   2. exact_dup — identical content, keep the min doc_id
  *      ([[Dedup.exactDuplicates]]);
  *   3. near_dup — near-duplicate clusters at token-set Jaccard ≥ t via
  *      MinHash+LSH candidates, exact verification, and connected
  *      components; keep each cluster's min doc_id ([[Dedup.dropList]]).
  *
  * Scale shape: stage 1 is a codegen projection (no shuffle); stage 2 is
  * one hash-groupBy; stage 3 is the banded-LSH machinery — nothing here
  * adds a new shuffle beyond the operators it composes.
  */
object CorpusClean {

  /** (doc_id, reason ∈ quality|exact_dup|near_dup) for every DROPPED
    * document; survivors are absent. */
  def dropDecisions(docs: DataFrame, minTokens: Int, maxStopPct: Int,
                    dedupThresholdPct: Int): DataFrame = {
    val lowQ = TextAnalysis.qualitySignals(docs)
      .where(col("n_tokens") < minTokens || col("stop_pct") > maxStopPct)
      .select(col("doc_id"), lit("quality").as("reason"))
    val qualityDocs = docs.join(lowQ.select("doc_id"), Seq("doc_id"), "left_anti")
    val exact = Dedup.exactDuplicates(qualityDocs)
      .select(col("doc_id"), lit("exact_dup").as("reason"))
    val uniqueDocs = qualityDocs
      .join(exact.select("doc_id"), Seq("doc_id"), "left_anti")
    val near = Dedup.dropList(uniqueDocs, dedupThresholdPct)
      .select(col("drop_id").as("doc_id"), lit("near_dup").as("reason"))
    lowQ.unionByName(exact).unionByName(near)
  }

  /** The cleaned corpus: input rows minus every drop decision. */
  def cleaned(docs: DataFrame, minTokens: Int, maxStopPct: Int,
              dedupThresholdPct: Int): DataFrame =
    docs.join(
      dropDecisions(docs, minTokens, maxStopPct, dedupThresholdPct)
        .select("doc_id"),
      Seq("doc_id"), "left_anti")
}
