package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.{cosineF, squaredL2F}
import graft.functions.VectorFunctions.vecLit

/** Brute-force exact k-NN — the reference's query semantics with nprobe=P
  * and no quantization error (SURVEY.md §7 phase 1). This is both a real
  * operator (the gold standard at moderate scale) and the recall oracle for
  * the ANN path.
  *
  * Physical plan: a single projection computing the distance inside
  * whole-stage codegen, then `orderBy(dist).limit(k)` which Catalyst
  * compiles to `TakeOrderedAndProject` — a per-partition bounded top-k
  * followed by a driver merge. That is exactly the reference's
  * `NBestByKey`-per-partition + global merge (reference/src/nbest.rs:7-137,
  * db/stored.rs:378-387) executed data-parallel: no global sort, no full
  * shuffle, scales linearly with executors at 100 TB.
  */
object ExactKnn {

  /** Top-k by squared L2 distance; ties broken by id for determinism. */
  def topK(df: DataFrame, vecCol: String, idCol: String,
           q: Seq[Float], k: Int): DataFrame =
    df.withColumn("sq_dist", squaredL2F(col(vecCol), vecLit(q)))
      .orderBy(col("sq_dist"), col(idCol))
      .limit(k)

  /** Top-k by cosine similarity (descending); the similarity-search
    * baseline for the embedding pipeline. */
  def topKCosine(df: DataFrame, vecCol: String, idCol: String,
                 q: Seq[Float], k: Int): DataFrame =
    df.withColumn("cos_sim", cosineF(col(vecCol), vecLit(q)))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)

  /** (rank, id) projection of [[topK]] — integer-only output for the
    * DuckDB hash oracle (float distances are order-reproducible but not
    * bit-reproducible across engines). The window runs over ≤ k rows on a
    * single partition, which is fine: k is small by contract. */
  def rankedIds(df: DataFrame, vecCol: String, idCol: String,
                q: Seq[Float], k: Int): DataFrame = {
    val w = Window.orderBy(col("sq_dist"), col(idCol))
    topK(df, vecCol, idCol, q, k)
      .select(row_number().over(w).cast("long").as("rank"), col(idCol))
  }

  /** (rank, id) projection of [[topKCosine]]. */
  def rankedIdsCosine(df: DataFrame, vecCol: String, idCol: String,
                      q: Seq[Float], k: Int): DataFrame = {
    val w = Window.orderBy(col("cos_sim").desc, col(idCol))
    topKCosine(df, vecCol, idCol, q, k)
      .select(row_number().over(w).cast("long").as("rank"), col(idCol))
  }

  /** Batch exact k-NN: one job answering many queries at once — where Spark
    * beats the reference's query-at-a-time loop (SURVEY.md §7 phase 7).
    * `queries` is a small DataFrame (qid, qvec) that is broadcast; the big
    * side streams through codegen once, and the grouped top-k is a partial
    * aggregation (map-side combine) — no full pairwise shuffle.
    */
  def batchTopK(df: DataFrame, vecCol: String, idCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int): DataFrame = {
    val pairs = df.join(broadcast(queries))
      .withColumn("sq_dist", squaredL2F(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("sq_dist"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sq_dist"), col(idCol))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
