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
  * adds a new shuffle beyond the operators it composes. Each stage's
  * survivor relation is materialized once (`localCheckpoint`, eager) before
  * the next stage consumes it: the branches below fan the lineage out into
  * several consumers (the reason union, the next stage's anti-join, and the
  * multi-pass LSH machinery), and without the checkpoint the raw corpus
  * scan and the quality projection re-execute once per consumer — at the
  * 100 TB target that is reading the corpus several times instead of once.
  * Executor-local block storage (memory-and-disk) holds one corpus-sized
  * relation per stage; blocks are released by the context cleaner when the
  * returned plan is no longer referenced, so repeated invocations do not
  * accumulate storage the way an un-unpersisted `cache()` would.
  */
object CorpusClean {

  /** (doc_id, reason ∈ quality|exact_dup|near_dup) for every DROPPED
    * document; survivors are absent. Eagerly materializes the two stage
    * checkpoints (see the object doc) when called. */
  def dropDecisions(docs: DataFrame, minTokens: Int, maxStopPct: Int,
                    dedupThresholdPct: Int): DataFrame = {
    // one corpus scan: signals appended to the payload, flagged, kept
    val sig = TextAnalysis.withQualitySignals(docs)
      .withColumn("low_q",
        col("n_tokens") < minTokens || col("stop_pct") > maxStopPct)
      .localCheckpoint()
    val lowQ = sig.where(col("low_q"))
      .select(col("doc_id"), lit("quality").as("reason"))
    // complementary filter of the same checkpoint — no anti-join needed
    val qualityDocs = sig.where(!col("low_q"))
      .select(docs.columns.map(col).toIndexedSeq: _*)
    // dup-id relation is tiny but its lineage is a corpus groupBy+join;
    // it feeds both the reason union and the next stage's anti-join
    val exact = Dedup.exactDuplicates(qualityDocs)
      .select(col("doc_id"), lit("exact_dup").as("reason"))
      .localCheckpoint()
    val uniqueDocs = qualityDocs
      .join(exact.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint()
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
