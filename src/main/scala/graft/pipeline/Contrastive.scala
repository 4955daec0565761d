package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive training-pair assembly: hard-negative mining and triplet
  * construction for embedding-model training data (the SimCSE/DPR-style
  * "in-batch negatives aren't enough" step — the best negatives are the
  * nearest non-positives, which is exactly what the kNN family already
  * computes).
  *
  * Composition contract, not computation: `knn` is ANY ranked neighbor
  * relation (qid, doc_id, rank) — [[graft.query.ExactKnn.batchTopK]]
  * output, the [[graft.query.AnnJoin]] approximate kNN join at corpus
  * scale, or a stored-index batch query — and `positives` is ANY
  * (qid, doc_id) relevance relation (near-dup pairs, label sharing,
  * click logs). Mining is then one anti-join + a per-anchor re-rank
  * window bounded by the kNN's k — nothing here scales with the corpus;
  * the heavy lifting stays in the operator that produced `knn`.
  */
object Contrastive {

  /** The k hardest negatives per anchor: `knn` rows that are neither
    * the anchor itself nor in `positives`, re-ranked 1..k per anchor in
    * original neighbor order. Output: (qid, doc_id, rank). The window
    * sorts ≤ k_knn rows per anchor — never the corpus. */
  def hardNegatives(knn: DataFrame, positives: DataFrame,
                    k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy("knn_rank")
    knn.select(col("qid"), col("doc_id"), col("rank").as("knn_rank"))
      .where(col("qid") =!= col("doc_id"))
      .join(positives.select(col("qid"), col("doc_id")),
        Seq("qid", "doc_id"), "left_anti")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("rank"))
  }

  /** (anchor, positive, negative) training triplets: every positive
    * pair crossed with the anchor's top `negativesPerPair` mined
    * negatives — a bounded ×n fan-out of the positives relation.
    * Output: (qid, pos_id, neg_id, rank). */
  def triplets(positives: DataFrame, negatives: DataFrame,
               negativesPerPair: Int): DataFrame =
    positives.select(col("qid"), col("doc_id").as("pos_id"))
      .join(negatives.where(col("rank") <= negativesPerPair)
          .select(col("qid"), col("doc_id").as("neg_id"), col("rank")),
        Seq("qid"))
      .select(col("qid"), col("pos_id"), col("neg_id"), col("rank"))
}
