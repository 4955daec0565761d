package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.squaredL2F
import graft.index.IvfPqModel
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

  /** EXACT top-k per streaming query row against a broadcast static
    * table. Fine while the static side fits a broadcast (GBs); at corpus
    * scale use [[annTopKPerQuery]], which probes the stored IVF+PQ index
    * instead of shipping raw vectors anywhere.
    * Output: (qid, id, sq_dist, rank); use outputMode("update") — each
    * query id's result appears in the trigger that carried the query. */
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

  /** APPROXIMATE top-k per streaming query row by probing a stored
    * IVF+PQ index — the 100 TB streaming path. Nothing big is broadcast
    * and no driver-side per-query planning happens: each query row
    * selects its nprobe cells with the [[topCellsL2]] kernel, the
    * stream-static equi-join on the cell id touches only probed
    * partitions of the codes table (partitionBy("partition") parquet →
    * partition-pruned by the join), and distances come from the
    * table-free PQ kernel [[pqDistDirect]] over the PQ codes — the
    * centroid/codebook tables ride as codegen literals (driver-resident
    * by IVF design, a few MB). Same distance semantics as
    * [[graft.query.AnnQuery.topK]] (asymmetric ‖(q−c) − decode‖², equal
    * up to float summation order).
    *
    * `codes` must carry (id, partition, codes) — e.g. the parquet from
    * IvfPqBuilder.save. Works identically when `queries` is a batch
    * DataFrame. Output: (qid, id, sq_dist, rank), outputMode("update"). */
  def annTopKPerQuery(queries: DataFrame, qidCol: String, qvecCol: String,
                      codes: DataFrame, model: IvfPqModel,
                      k: Int, nprobe: Int): DataFrame =
    graft.query.AnnQuery
      .batchTopKDirect(codes, model, queries, qidCol, qvecCol, k, nprobe)
      .withColumnRenamed("qid", qidCol)

  /** [[annTopKPerQuery]] over an OPQ store — same stateless stream-static
    * shape via the OPQ table-free batch path
    * ([[graft.index.OpqBuilder.batchTopKDirect]]): the query rotation is
    * a per-row kernel call, so nothing is planned per query or per
    * micro-batch on the driver. */
  def annTopKPerQueryOpq(queries: DataFrame, qidCol: String, qvecCol: String,
                         codes: DataFrame, model: graft.index.OpqModel,
                         k: Int, nprobe: Int): DataFrame =
    graft.index.OpqBuilder
      .batchTopKDirect(codes, model, queries, qidCol, qvecCol, k, nprobe)
      .withColumnRenamed("qid", qidCol)

  /** Streaming HAMMING top-k per query row against broadcast binary
    * signatures — the [[topKPerQuery]] shape with the static side
    * compressed 32× (8 bytes per 64 dims via `Kernels.signBits`), which
    * lifts the broadcast ceiling by the same factor: a corpus whose raw
    * f32 vectors stopped fitting a broadcast at ~10M rows carries
    * ~300M rows as signatures. Each micro-batch binarizes its queries
    * with the same kernel and ranks by popcount-xor
    * (`Kernels.hammingDist`); results are bit-identical to
    * [[graft.index.BinaryQuant.rankedIds]] per query. `dim` sizes the
    * zero-threshold default when `thresholds` is null. Output:
    * (qid, id, hamming, rank), outputMode("update"). */
  def hammingTopKPerQuery(queries: DataFrame, qidCol: String,
                          qvecCol: String, points: DataFrame, idCol: String,
                          vecCol: String, k: Int,
                          thresholds: Array[Double], dim: Int): DataFrame = {
    val thr = graft.functions.FastFunctions.litDoubles(
      if (thresholds != null) thresholds else new Array[Double](dim))
    val sigs = points.select(col(idCol).as("id"),
      graft.functions.FastFunctions.signBitsF(col(vecCol), thr).as("__sig"))
    val pairs = queries
      .select(col(qidCol),
        graft.functions.FastFunctions.signBitsF(col(qvecCol), thr)
          .as("__qsig"))
      .join(broadcast(sigs))
      .select(col(qidCol), col("id"),
        graft.functions.FastFunctions.hammingDistF(col("__sig"),
          col("__qsig")).cast("double").as("ham"))
    pairs.groupBy(col(qidCol))
      .agg(TopKAggregator.topK(k)(col("ham"), col("id")).as("hits"))
      .select(col(qidCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(qidCol), col("hit.id").as(idCol),
        col("hit.dist").cast("long").as("hamming"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** STREAMING INGEST into a stored index: every micro-batch of new
    * vectors is encoded against the frozen model and appended to the
    * partitioned codes store — exactly
    * [[graft.index.IvfPqBuilder.appendToStore]] per trigger, so the
    * stored contents equal a batch encode of the same rows (encoding is
    * a pure function of (model, vector)), queries see each batch as
    * soon as its files land, and the append-drift telemetry fires per
    * batch through `log`. foreachBatch rather than a streaming parquet
    * sink because an append is TWO writes (codes + stats sidecar) that
    * must ride the same trigger.
    *
    * The caller owns trigger/checkpoint and `.start()`:
    * {{{
    *   StreamingKnn.ingestToStore(stream, "id", "vec", model, path)
    *     .option("checkpointLocation", ckpt).start()
    * }}}
    * Exactly-once caveat (same as any foreachBatch file append): a
    * trigger retried after a crash between the codes write and the
    * checkpoint commit re-appends its batch; at-least-once appends are
    * made harmless by [[graft.index.IvfPqBuilder.compactStore]]-style
    * maintenance plus id-keyed dedup on read, or by keying batch files
    * with batchId upstream. */
  def ingestToStore(vectors: DataFrame, idCol: String, vecCol: String,
                    model: IvfPqModel, path: String,
                    log: String => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // no batch.count() here — that would be a whole extra job per
        // trigger just for a log line; the drift report carries the sizes
        log(s"ingest batch $batchId")
        graft.index.IvfPqBuilder.appendToStore(model, batch.toDF(),
          idCol, vecCol, path, log)
    }
}
