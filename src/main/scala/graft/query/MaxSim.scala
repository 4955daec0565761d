package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Late-interaction (multi-vector) retrieval scoring — the ColBERT
  * MaxSim operator (Khattab & Zaharia, SIGIR'20):
  *
  *   score(q, d) = Σ_{i ∈ q tokens} max_{j ∈ d tokens} sim(q_i, d_j)
  *
  * Each query token finds its best-matching document token and the
  * per-token maxima sum — finer-grained than single-vector retrieval
  * (a document matches if it covers ALL the query's aspects somewhere,
  * not if its mean vector is close) at the cost of token-level vectors.
  *
  * Scale shape: the interaction join is bounded by an explicit
  * CANDIDATE relation (qid, doc_id) — at 100 TB candidates come from a
  * first-stage retriever (BM25 postings, single-vector ANN over pooled
  * embeddings, or [[HybridSearch]]), so the expensive token×token work
  * touches |candidates|·|q tokens|·|d tokens| rows, never the corpus.
  * Both reductions (per-query-token max, per-pair sum) are ordinary
  * map-side-combinable aggregates; nothing is broadcast, nothing is
  * collected.
  *
  * Similarity is the DOT product (ColBERT normalizes token embeddings,
  * making dot = cosine; pass pre-normalized vectors for cosine
  * semantics — [[graft.pipeline.Embeddings.l2Normalized]]).
  */
object MaxSim {

  /** Score every candidate (qid, doc_id) pair.
    *
    * @param queryVecs (qid, qpos, qvec) — one row per query token
    * @param docVecs   (doc_id, dpos, dvec) — one row per document token
    * @param candidates (qid, doc_id) pairs to score (dedup'd here; a
    *                   duplicated candidate must not double-score)
    * @return (qid, doc_id, score) — higher is better
    */
  def score(queryVecs: DataFrame, docVecs: DataFrame,
            candidates: DataFrame): DataFrame =
    candidates.select("qid", "doc_id").distinct()
      .join(queryVecs.select("qid", "qpos", "qvec"), "qid")
      .join(docVecs.select("doc_id", "dpos", "dvec"), "doc_id")
      .withColumn("sim",
        graft.functions.VectorFunctions.dot(col("qvec"), col("dvec")))
      .groupBy("qid", "doc_id", "qpos")
      .agg(max(col("sim")).as("best"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("best")).as("score"))

  /** Top-k candidates per query by MaxSim, deterministically ranked
    * (score descending, doc_id ascending on ties). The per-query sort
    * is bounded by that query's candidate count, never the corpus. */
  def topK(queryVecs: DataFrame, docVecs: DataFrame,
           candidates: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    score(queryVecs, docVecs, candidates)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
