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

  /** Salt recommendation from a per-cell population histogram: the skew
    * ratio max-cell/mean-cell (EMPTY cells included in the mean — a
    * drifted ingest that abandons most cells must read as skewed, the
    * same convention as IvfPqBuilder's append-drift telemetry), ceil'd
    * and clamped to [floor, 64]. A cell `r`× the mean serializes into
    * one r·g² task without salting; salt ≈ r restores ~mean-sized
    * tasks, and the cost of over-salting is only linear replication of
    * one join side, so the cap matters more than precision. */
  def recommendedSalt(cellCounts: Seq[Long], numPartitions: Int,
                      floor: Int = 4): Int = {
    val mean = cellCounts.sum.toDouble / math.max(numPartitions, 1)
    val imbalance =
      if (mean > 0 && cellCounts.nonEmpty) cellCounts.max / mean else 0.0
    math.min(64, math.max(floor, math.ceil(imbalance).toInt))
  }

  /** [[recommendedSalt]] for a STORED index, fed from the append-drift
    * stats sidecar ([[graft.index.IvfPqBuilder.cellHistogram]] — P rows,
    * no codes scan): the telemetry that recommends a rebalance is the
    * same signal that sizes the salt for cell-bucketed joins run
    * against the drifted store in the meantime. */
  def autoSaltFromStore(spark: org.apache.spark.sql.SparkSession,
                        path: String, numPartitions: Int,
                        floor: Int = 4): Int =
    recommendedSalt(
      graft.index.IvfPqBuilder.cellHistogram(spark, path)
        .collect().map(_.getLong(1)).toSeq,
      numPartitions, floor)

  // salt = 0 → derive from the join's OWN bucket histogram: one narrow
  // count over the exploded (id, cell) relation, then recommendedSalt.
  // An extra small job, paid only when the caller opts into auto.
  private def resolveSalt(salt: Int, exploded: DataFrame,
                          numPartitions: Int): Int =
    if (salt > 0) salt
    else recommendedSalt(
      exploded.groupBy("cell").agg(count(lit(1)).as("cnt"))
        .collect().map(_.getLong(1)).toSeq,
      numPartitions)

  /** All pairs with cosine ≥ thresholdMilli/1000 among vectors sharing an
    * IVF cell. Output: (a_id, b_id) — ids only, ordered a < b.
    *
    * @param salt split each cell's bucket into `salt` sub-buckets (right
    *        side keys by hash(id) mod salt, left side replicates one row
    *        per sub-bucket) so a HOT cell of g vectors becomes `salt`
    *        tasks of g·g/salt comparisons instead of one g² task — same
    *        skew treatment as Dedup.minHashLshPairs; output is identical
    *        for any salt. Default 4, matching Dedup.minHashLshPairs: a
    *        hot IVF cell — the dense duplicate cluster this operator
    *        exists to find — would otherwise serialize into one g² task
    *        unless the caller remembered the knob, and the cost (salt×
    *        replication of one side's rows) is linear and small. Raise
    *        further when cluster size ≫ executor count × salt. Pass 0
    *        to AUTO-SIZE from the measured cell histogram
    *        ([[recommendedSalt]]); with a stored index,
    *        [[autoSaltFromStore]] reads the same skew from the drift
    *        sidecar without touching the vectors. */
  def cosineSelfJoin(embeddings: DataFrame, idCol: String, vecCol: String,
                     model: IvfPqModel, thresholdMilli: Int,
                     nprobe: Int = 2, salt: Int = 4): DataFrame = {
    val flat = model.partitionCentroids.flatten.toSeq
    val e = embeddings
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cells", topCellsL2(col("v"), flat, nprobe))
      .select(col("id"), col("v"), col("cells"),
        explode(col("cells")).as("cell"))
    val s = resolveSalt(salt, e, model.config.numPartitions)
    // spread rows on the JOIN keys: the broadcast-join case inherits this
    // parallelism (no single-split source layout), and the shuffle-join
    // case reuses the exchange outright — repartitioning on anything else
    // would be a full extra shuffle the join immediately redoes
    val w = graft.functions.PlanShape.dataSizedParts(e)
    val right = e.withColumn("salt", pmod(xxhash64(col("id")), lit(s)))
      .repartition(w, col("cell"), col("salt"))
    val left = e.withColumn("salt",
      explode(typedlit((0 until s).map(_.toLong))))
      .repartition(w, col("cell"), col("salt"))
    left.as("x").join(right.as("y"),
        col("x.cell") === col("y.cell") && col("x.salt") === col("y.salt") &&
        col("x.id") < col("y.id") &&
        firstCommon(col("x.cells"), col("y.cells")) === col("x.cell"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        cosineF(col("x.v"), col("y.v")).as("cos"))
      .where(col("cos") * 1000 >= thresholdMilli)
      .select(col("a_id"), col("b_id"))
  }

  /** BIPARTITE cosine near-dup join — the embedding analogue of
    * `Dedup.minHashLshPairsBipartite`: a NEW batch of vectors against a
    * (much larger) stored corpus, never corpus×corpus. Same symmetric
    * probe-set bucketing as [[cosineSelfJoin]] (pair scored iff probe
    * sets intersect, emit-once under the new side's probe order, exact
    * cosine verify → no false pairs), with the `a < b` ordering replaced
    * by the two relations being distinct. At 100 TB the corpus side's
    * (id, vector, cells) relation is the thing you PERSIST bucketed by
    * cell so each daily batch joins against the layout without
    * re-assigning history. Stateless and stream-safe: with `newEmb` a
    * streaming DataFrame this is a stream-static join (no watermarks, no
    * state) — each micro-batch's pairs land in its own trigger.
    * Ids must be disjoint across sides (same contract as the bipartite
    * LSH join). Output: (new_id, corpus_id). */
  def cosineBipartiteJoin(newEmb: DataFrame, corpusEmb: DataFrame,
                          idCol: String, vecCol: String, model: IvfPqModel,
                          thresholdMilli: Int, nprobe: Int = 2,
                          salt: Int = 4): DataFrame = {
    val flat = model.partitionCentroids.flatten.toSeq
    def keyed(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cells", topCellsL2(col("v"), flat, nprobe))
      .select(col("id"), col("v"), col("cells"),
        explode(col("cells")).as("cell"))
    // auto mode sizes from the CORPUS side — the persisted, drift-prone
    // relation; the new batch only replicates
    val s = resolveSalt(salt, keyed(corpusEmb), model.config.numPartitions)
    val left = keyed(newEmb)
      .withColumn("salt", explode(typedlit((0 until s).map(_.toLong))))
    val right = keyed(corpusEmb)
      .withColumn("salt", pmod(xxhash64(col("id")), lit(s)))
      .repartition(graft.functions.PlanShape.dataSizedParts(corpusEmb),
        col("cell"), col("salt"))
    left.as("x").join(right.as("y"),
        col("x.cell") === col("y.cell") && col("x.salt") === col("y.salt") &&
        // sides are documented disjoint, but guard so an overlapping
        // re-ingest can't emit (x, x) self-pairs
        col("x.id") =!= col("y.id") &&
        firstCommon(col("x.cells"), col("y.cells")) === col("x.cell"))
      .select(col("x.id").as("new_id"), col("y.id").as("corpus_id"),
        cosineF(col("x.v"), col("y.v")).as("cos"))
      .where(col("cos") * 1000 >= thresholdMilli)
      .select(col("new_id"), col("corpus_id"))
  }

  /** Approximate kNN JOIN — the 100 TB kNN-graph path
    * [[graft.query.ExactKnn.knnJoin]] points to when the corpus stops
    * being broadcastable. Candidate generation is SYMMETRIC cell
    * bucketing (the cosineSelfJoin geometry, run over ordered pairs):
    * every vector is keyed by each of its `nprobe` nearest coarse
    * cells, and a (query, candidate) pair is scored iff their probe
    * sets intersect — nothing is broadcast, both sides shuffle once on
    * (cell, salt), and `firstCommon` under the query's probe order
    * makes each ordered pair meet in exactly ONE cell (no distinct over
    * the scored relation). Symmetric beats the one-sided "candidate's
    * home cell ∈ query's probes" contract on recall at equal nprobe —
    * boundary-straddling neighbors are caught from EITHER side
    * (measured on the fixture corpus at nprobe=3: ~96% vs 66-68%
    * one-sided, both sfs) — for a linear nprobe× replication of the
    * candidate rows. The per-query bounded top-k is the same map-side-combining
    * [[TopKAggregator]] as the exact path: the aggregation shuffle
    * carries ≤ k candidates per (query, task), never the full
    * candidate relation. Distances are EXACT (vectors ride through the
    * join, squared L2 per pair), so the only error mode is a MISS — a
    * true neighbor sharing no probed cell — shrinking with nprobe
    * exactly as stored-index recall does.
    *
    * Output: (qid, rank, `idCol`) — same contract as ExactKnn.knnJoin;
    * a query lands < k rows only when its probed cells hold < k other
    * vectors. `salt` as in [[cosineSelfJoin]]. */
  def knnJoin(embeddings: DataFrame, idCol: String, vecCol: String,
              model: IvfPqModel, k: Int, nprobe: Int = 2,
              salt: Int = 4): DataFrame = {
    val flat = model.partitionCentroids.flatten.toSeq
    val e = embeddings
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cells", topCellsL2(col("v"), flat, nprobe))
      .select(col("id"), col("v"), col("cells"),
        explode(col("cells")).as("cell"))
    val s = resolveSalt(salt, e, model.config.numPartitions)
    val wk = graft.functions.PlanShape.dataSizedParts(e)
    val queries = e
      .withColumn("salt", explode(typedlit((0 until s).map(_.toLong))))
      .repartition(wk, col("cell"), col("salt"))
    val cands = e
      .withColumn("salt", pmod(xxhash64(col("id")), lit(s)))
      .repartition(wk, col("cell"), col("salt"))
    // emit-once: the pair is scored only where the QUERY's probe list
    // first intersects the candidate's — unique per ordered pair
    val pairs = queries.as("x").join(cands.as("y"),
        col("x.cell") === col("y.cell") && col("x.salt") === col("y.salt") &&
        col("x.id") =!= col("y.id") &&
        firstCommon(col("x.cells"), col("y.cells")) === col("x.cell"))
      .select(col("x.id").as("qid"), col("y.id").as("id"),
        squaredL2F(col("x.v"), col("y.v")).as("sq_dist"))
    pairs.groupBy("qid")
      .agg(TopKAggregator.topK(k)(col("sq_dist"), col("id")).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("hit.id").as(idCol))
  }
}
