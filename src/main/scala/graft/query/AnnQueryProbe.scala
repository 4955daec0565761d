package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.IvfPqModel

/** Diagnostic twin of [[AnnQuery.batchTopKAdc]] with the bounded top-k
  * aggregate replaced by a plain sum — isolates the scan's cost from
  * the aggregate's when profiling batch throughput. Not an operator. */
object AnnQueryProbe {
  def scanOnly(codes: DataFrame, model: IvfPqModel, queries: DataFrame,
               qidCol: String, qvecCol: String, nprobe: Int): DataFrame = {
    val centFlat = graft.functions.FastFunctions
      .litDoubles(model.partitionCentroids.flatten)
    val cbLit = graft.functions.FastFunctions
      .litDoubles(model.codebooks.flatten.flatten)
    val slim = queries.select(col(qidCol).as("qid"),
        col(qvecCol).as("qvec"),
        explode(graft.functions.FastFunctions.topCellsL2(col(qvecCol),
          model.partitionCentroids.flatten.toSeq, nprobe)).as("cell64"))
      // int cell key: matches the codes table's partition column type, so
      // the two REPARTITION_BY_COL exchanges satisfy the join's
      // requirement directly (a long/int mismatch re-exchanged one side)
      .withColumn("probe_cell", col("cell64").cast("int")).drop("cell64")
      .repartition(col("probe_cell"))
    val probed = slim
      .select(col("qid"), col("probe_cell"),
        graft.functions.FastFunctions.adcTableF(col("qvec"), centFlat,
          col("probe_cell"), cbLit,
          model.config.numDivisions, model.config.numCodes)
          .as("flat_table"))
    val scanned = codes.repartition(col("partition")).hint("SHUFFLE_HASH")
    probed.join(scanned, col("probe_cell") === col("partition"))
      .select(graft.functions.FastFunctions.adcDistCol(col("codes"),
        col("flat_table"), model.config.numCodes).as("sq_dist"))
      .agg(sum(col("sq_dist")))
  }
}
