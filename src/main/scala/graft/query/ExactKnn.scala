package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.{cosineF, dotF, squaredL2F}
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

  /** Top-k by INNER PRODUCT (descending) — maximum-inner-product search
    * (MIPS), the scoring of dot-product-trained retrieval embeddings
    * (where vector norm carries signal, so neither L2 nor cosine order
    * matches). Same single-projection + TakeOrderedAndProject plan as
    * [[topK]]. */
  def topKIp(df: DataFrame, vecCol: String, idCol: String,
             q: Seq[Float], k: Int): DataFrame =
    df.withColumn("ip", dotF(col(vecCol), vecLit(q)))
      .orderBy(col("ip").desc, col(idCol))
      .limit(k)

  /** (rank, id) projection of [[topKIp]]. */
  def rankedIdsIp(df: DataFrame, vecCol: String, idCol: String,
                  q: Seq[Float], k: Int): DataFrame = {
    val w = Window.orderBy(col("ip").desc, col(idCol))
    topKIp(df, vecCol, idCol, q, k)
      .select(row_number().over(w).cast("long").as("rank"), col(idCol))
  }

  /** Batch exact k-NN: one job answering many queries at once — where Spark
    * beats the reference's query-at-a-time loop (SURVEY.md §7 phase 7).
    * `queries` is a small DataFrame (qid, qvec) that is broadcast; the big
    * side streams through codegen once, and the grouped top-k is a REAL
    * aggregation (TopKAggregator, map-side combinable): each task keeps at
    * most k candidates per query, so the shuffle carries k·|queries| rows
    * regardless of the point count — never the full pairwise relation.
    * Output: (qid, id, sq_dist, rank) with rank 1..k ascending by distance.
    */
  def batchTopK(df: DataFrame, vecCol: String, idCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int): DataFrame = {
    // fan out the streamed side: the per-row work is |queries| distance
    // kernels, and a single-split source would run the whole pass in
    // one task (round-15 profile: 1.6-2.6 s one-task jobs on a 32-core
    // box); identity at data scale
    val pairs = graft.functions.PlanShape.fanOut(df).join(broadcast(queries))
      .select(col(qidCol), col(idCol).as("id"),
        squaredL2F(col(vecCol), col(qvecCol)).as("sq_dist"))
    pairs.groupBy(col(qidCol))
      .agg(TopKAggregator.topK(k)(col("sq_dist"), col("id")).as("hits"))
      .select(col(qidCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(qidCol), col("hit.id").as(idCol),
        col("hit.dist").as("sq_dist"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Batch MIPS: [[batchTopK]] with inner-product scoring — the bounded
    * top-k aggregate keeps the k LARGEST dots per query by aggregating
    * the NEGATED score (the aggregate's (dist, id) total order then
    * ranks ip descending with ties to the smaller id, matching
    * [[topKIp]]). Same scale shape: broadcast queries, one streamed
    * pass, k·|queries| shuffle rows. Output (qid, id, ip, rank). */
  def batchTopKIp(df: DataFrame, vecCol: String, idCol: String,
                  queries: DataFrame, qidCol: String, qvecCol: String,
                  k: Int): DataFrame = {
    // fan out the streamed side (the batchTopK rationale)
    val pairs = graft.functions.PlanShape.fanOut(df).join(broadcast(queries))
      .select(col(qidCol), col(idCol).as("id"),
        dotF(col(vecCol), col(qvecCol)).as("ip"))
    pairs.groupBy(col(qidCol))
      .agg(TopKAggregator.topK(k)(-col("ip"), col("id")).as("hits"))
      .select(col(qidCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(qidCol), col("hit.id").as(idCol),
        (-col("hit.dist")).as("ip"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Passage→DOCUMENT retrieval aggregation for multi-vector corpora
    * (one embedding per passage, ranking wanted per document): each
    * query's passage hits collapse to their parent document scored by
    * the BEST (minimum-distance) passage — the MaxP rule (Dai & Callan
    * 2019, arXiv:1905.09217), the standard passage-to-doc reduction —
    * then a bounded top-k keeps the best `k` documents per query.
    * `hits` is any (qidCol, docCol, distCol) relation — typically
    * [[batchTopK]] output with the passage→doc mapping attached — so
    * the aggregation is fixed-width rows only: a map-side-combined min
    * per (query, doc) and the [[TopKAggregator]] bounded heap per
    * query, never a corpus-wide sort. Ties rank toward the smaller doc
    * id. Output: (qidCol, docCol, doc_rank). */
  def docTopK(hits: DataFrame, qidCol: String, docCol: String,
              distCol: String, k: Int): DataFrame =
    hits.groupBy(col(qidCol), col(docCol))
      .agg(min(col(distCol)).as("__doc_dist"))
      .groupBy(col(qidCol))
      .agg(TopKAggregator.topK(k)(col("__doc_dist"), col(docCol)).as("hits"))
      .select(col(qidCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(qidCol), col("hit.id").as(docCol),
        (col("pos") + 1).cast("long").as("doc_rank"))

  /** k-NN LABEL PROPAGATION (weak supervision / pseudo-labeling): each
    * query point takes the MAJORITY label of its k nearest labeled
    * points — the classic kNN classifier run as one [[batchTopK]] pass
    * plus a label join and a per-query vote. Ties break to the smallest
    * label (deterministic, oracle-reproducible). The labeled relation
    * streams through codegen once; the vote aggregates ≤ k rows per
    * query. Output: (qid, pred_label, votes). */
  def knnClassify(labeled: DataFrame, vecCol: String, idCol: String,
                  labelCol: String, queries: DataFrame, qidCol: String,
                  qvecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = batchTopK(labeled, vecCol, idCol, queries, qidCol, qvecCol, k)
    val votes = hits
      .join(labeled.select(col(idCol), col(labelCol).as("pred_label")), idCol)
      .groupBy(col(qidCol), col("pred_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(qidCol)
      .orderBy(col("votes").desc, col("pred_label"))
    votes.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col(qidCol), col("pred_label"), col("votes"))
  }

  /** Exact k-NN JOIN (the kNN graph): every point's k nearest OTHER
    * points, ranked (dist asc, id) — the substrate for graph-based
    * dedup, diversity sampling, and cluster seeding. The self-match is
    * excluded in the pair projection BEFORE the bounded top-k
    * aggregate, so the aggregate asks for exactly k per query and the
    * output ranks come straight from the aggregate's total order — no
    * second window pass, no k+1 overshoot. EXACT and broadcast-bound:
    * use it only while the (id, vector) projection fits an executor —
    * the operator refuses inputs above `maxRows` instead of silently
    * shipping an executor-crushing broadcast; past the cap,
    * [[graft.query.AnnJoin.knnJoin]] is the same contract with
    * candidates from shared IVF cells and nothing broadcast (misses
    * bounded by nprobe, distances still exact).
    *
    * The guard costs one count() job per call — a skipped-column scan,
    * cheap on parquet but a full materialization of a computed input.
    * Callers that already know the size pass `knownRows` (>= 0) to
    * skip the job; `maxRows = Long.MaxValue` skips the guard entirely
    * (keeping the plan lazy — required for streaming inputs) and means
    * "I accept the broadcast".
    * Output: (qid, rank, `idCol`). */
  def knnJoin(df: DataFrame, vecCol: String, idCol: String,
              k: Int, maxRows: Long = 1000000L,
              knownRows: Long = -1L): DataFrame = {
    if (maxRows < Long.MaxValue) {
      val n = if (knownRows >= 0L) knownRows else df.count()
      require(n <= maxRows,
        s"ExactKnn.knnJoin broadcasts the full (id, vector) relation — " +
          s"capped at $maxRows rows (got $n); use AnnJoin.knnJoin for the " +
          s"IVF-bucketed path, or raise maxRows explicitly")
    }
    val q = df.select(col(idCol).as("__qid"), col(vecCol).as("__qvec"))
    // fan out the streamed side: n·|q| distance kernels on a
    // single-split source ran as ONE task (the batchTopK rationale)
    val pairs = graft.functions.PlanShape.fanOut(df).join(broadcast(q))
      .where(col(idCol) =!= col("__qid"))
      .select(col("__qid"), col(idCol).as("id"),
        squaredL2F(col(vecCol), col("__qvec")).as("sq_dist"))
    pairs.groupBy(col("__qid"))
      .agg(TopKAggregator.topK(k)(col("sq_dist"), col("id")).as("hits"))
      .select(col("__qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("__qid").as("qid"),
        (col("pos") + 1).cast("long").as("rank"), col("hit.id").as(idCol))
  }
}
