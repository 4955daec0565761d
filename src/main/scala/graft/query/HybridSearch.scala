package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse ranked lists from heterogeneous retrievers
  * (keyword search, vector k-NN, …) by Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher, SIGIR'09): each list contributes
  * 1/(c + rank) to a document's fused score, so agreement across
  * retrievers dominates any single list's scores — no score
  * calibration between retrievers needed, which is exactly why RRF is
  * the standard fusion for BM25 + embedding search.
  *
  * The score is computed in INTEGER arithmetic — `scale div (c + rank)`
  * summed over lists — so the fused ranking is bit-identical across
  * engines (a float 1/(c+r) sum can reorder ties in the last ulp).
  * With scale = 1e6 and c = 60, distinct (rank-set → score) collisions
  * only happen where float RRF collides too.
  *
  * Scale shape: each input list is already top-k (retriever-bounded);
  * the fusion is a union + one map-side-combined groupBy over ≤ Σ kᵢ
  * rows — never corpus-sized. The final sort runs over the fused
  * candidate set only.
  */
object HybridSearch {

  /** Fuse ranked lists. Each input must have columns (`idCol`, rank)
    * with rank 1-based. Returns (`idCol`, rrf_scaled, n_lists, rank)
    * ordered and ranked by (rrf_scaled desc, id). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
              c: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(rankings.nonEmpty, "no ranked lists to fuse")
    val contrib = rankings
      .map(_.select(col(idCol), col("rank")))
      .reduce(_ unionByName _)
      .select(col(idCol),
        expr(s"$scale div (rank + $c)").as("part"))
    val fused = contrib.groupBy(col(idCol))
      .agg(sum(col("part")).as("rrf_scaled"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_scaled").desc, col(idCol))
      .limit(k)
    fused.withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_scaled").desc, col(idCol)))
          .cast("long"))
      .select(col("rank"), col(idCol), col("rrf_scaled"), col("n_lists"))
  }
}
