package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.squaredL2F
import graft.query.TopKAggregator

/** Streaming k-NN: a stream of query vectors scored against a static
  * vector table — the Spark re-expression of the reference's async query
  * path (reference/src/asyncdb/stored/query.rs): where the reference
  * overlaps per-query IO with a hand-written future, here each
  * micro-batch answers its whole set of queries as one stream-static
  * join + grouped bounded top-k, and Spark owns the concurrency.
  *
  * Works identically on a batch `queries` DataFrame (then it IS
  * ExactKnn.batchTopK's plan shape).
  */
object StreamingKnn {

  /** Top-k per streaming query row. `queries` is the (streaming) side
    * with (qidCol, qvecCol); `points` is the static table — broadcast,
    * so the per-trigger work is one codegen'd scan of the points with no
    * shuffle of the stream. Output: (qid, id, sq_dist, rank); use
    * outputMode("update") — each query id's result appears in the
    * trigger that carried the query. */
  def topKPerQuery(queries: DataFrame, qidCol: String, qvecCol: String,
                   points: DataFrame, idCol: String, vecCol: String,
                   k: Int): DataFrame = {
    val pairs = queries.join(broadcast(points))
      .select(col(qidCol), col(idCol).as("id"),
        squaredL2F(col(vecCol), col(qvecCol)).as("sq_dist"))
    pairs.groupBy(col(qidCol))
      .agg(TopKAggregator.topK(k)(col("sq_dist"), col("id")).as("hits"))
      .select(col(qidCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(qidCol), col("hit.id").as(idCol),
        col("hit.dist").as("sq_dist"), (col("pos") + 1).cast("long").as("rank"))
  }
}
