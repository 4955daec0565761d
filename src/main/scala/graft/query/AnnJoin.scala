package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions._
import graft.index.IvfPqModel

/** ANN similarity self-join — the 100 TB path for embedding near-dup
  * detection, replacing the O(n²) all-pairs scan of
  * [[graft.pipeline.Dedup.embeddingNearDupPairs]] with IVF bucketing:
  * only vectors sharing one of their nprobe nearest coarse cells are
  * ever compared, and every surviving pair is verified with the exact
  * cosine, so there are no false positives — only (rare, geometry-
  * dependent) misses of pairs straddling cell boundaries beyond the
  * probe set. Multi-probe (nprobe ≥ 2) shrinks that miss set the same
  * way query-side nprobe does for k-NN.
  *
  * Plan shape: one projection assigns each vector its nprobe cells (the
  * P×dim centroid table rides as a codegen literal — P·dim is small by
  * IVF design; at very large P·dim swap in a broadcast variable), an
  * explode keys rows by cell, and the self-join meets each candidate
  * pair in exactly ONE cell — `firstCommon(x.cells, y.cells) = cell`
  * picks the first shared cell under x's probe order, unique per ordered
  * pair, so no distinct() over the candidate multiset. Vectors ride
  * through the join (nprobe × vec bytes, linear in corpus size).
  */
object AnnJoin {

  /** All pairs with cosine ≥ thresholdMilli/1000 among vectors sharing an
    * IVF cell. Output: (a_id, b_id) — ids only, ordered a < b.
    *
    * @param salt split each cell's bucket into `salt` sub-buckets (right
    *        side keys by hash(id) mod salt, left side replicates one row
    *        per sub-bucket) so a HOT cell of g vectors becomes `salt`
    *        tasks of g·g/salt comparisons instead of one g² task — same
    *        skew treatment as Dedup.minHashLshPairs; output is identical
    *        for any salt. Use > 1 when cell populations are huge relative
    *        to executor count (dense clusters at corpus scale). */
  def cosineSelfJoin(embeddings: DataFrame, idCol: String, vecCol: String,
                     model: IvfPqModel, thresholdMilli: Int,
                     nprobe: Int = 2, salt: Int = 1): DataFrame = {
    val flat = model.partitionCentroids.flatten.toSeq
    val e = embeddings
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cells", topCellsL2(col("v"), flat, nprobe))
      .select(col("id"), col("v"), col("cells"),
        explode(col("cells")).as("cell"))
    // spread rows on the JOIN keys: the broadcast-join case inherits this
    // parallelism (no single-split source layout), and the shuffle-join
    // case reuses the exchange outright — repartitioning on anything else
    // would be a full extra shuffle the join immediately redoes
    val right = e.withColumn("salt", pmod(xxhash64(col("id")), lit(salt)))
      .repartition(col("cell"), col("salt"))
    val left = e.withColumn("salt",
      explode(typedlit((0 until salt).map(_.toLong))))
      .repartition(col("cell"), col("salt"))
    left.as("x").join(right.as("y"),
        col("x.cell") === col("y.cell") && col("x.salt") === col("y.salt") &&
        col("x.id") < col("y.id") &&
        firstCommon(col("x.cells"), col("y.cells")) === col("x.cell"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        cosineF(col("x.v"), col("y.v")).as("cos"))
      .where(col("cos") * 1000 >= thresholdMilli)
      .select(col("a_id"), col("b_id"))
  }
}
