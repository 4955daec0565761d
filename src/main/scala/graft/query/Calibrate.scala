package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.{squaredL2F, topCellsL2}
import graft.index.IvfPqModel

/** Recall CALIBRATION for the IVF index: turn the caller-fixed `nprobe`
  * knob into a measured decision. The reference (and every IVF engine)
  * leaves nprobe to the operator; in production the question is always
  * "what's the smallest nprobe that reaches recall R?" — answered here
  * by an operator, not a hand-run probe script (which is what
  * tools/FilteredAnnProbe.scala hand-rolled before this existed).
  *
  * The whole nprobe-recall CURVE comes from ONE distributed pass, not a
  * per-nprobe rerun, via the probe-rank identity: for a query q and its
  * true neighbor e, e's home cell sits at some position r in q's
  * cell-distance ordering (its PROBE RANK); e is a candidate at
  * `nprobe = n` iff r ≤ n. With exact re-ranking over probed candidates
  * ([[AnnQuery.batchTopKRerank]]'s refine stage, kFactor covering), a
  * probed true top-k neighbor always wins a slot — any true top-k point
  * is at least as close as every non-top-k candidate — so
  *
  *   end-to-end recall@n  =  P(probe_rank ≤ n)  over (query, neighbor)
  *
  * and the empirical curve is just the cumulative histogram of probe
  * ranks. Two corollaries the spec and the driver gate assert: the curve
  * is monotone non-decreasing in n, and recall@P = 1 exactly. (ADC-only
  * querying, without the exact refine, sits below this curve by the
  * quantization error — the curve is the candidate-generation ceiling.)
  *
  * Scale shape: the sample is a deterministic bounded top-k (never a
  * global sort); exact neighbors come from the broadcast-queries +
  * bounded-top-k-aggregate pass (shuffle = k·|sample| rows); the cell
  * lookup is a semi-join against the 2-column codes projection; probe
  * ranks are one kernel call per pair against the driver-resident
  * centroid literal; the curve aggregate is ≤ P rows. Nothing anywhere
  * is corpus × corpus.
  */
object Calibrate {

  /** Deterministic query sample: `n` corpus vectors chosen by the md5
    * race (a pure function of (seed, id) — rerun/repartition-stable, the
    * [[graft.pipeline.TrainingData]] sampling idiom). Output
    * (qid, qvec). */
  def sampleQueries(vectors: DataFrame, vecCol: String, idCol: String,
                    n: Int, seed: String = "cal"): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    vectors
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .orderBy(md5(concat(lit(s"$seed:"), col("qid").cast("string"))
        .cast("binary")), col("qid"))
      .limit(n)
  }

  /** Exact top-k neighbors (self excluded) of each sampled query —
    * the calibration ground truth. Output (qid, id, rank). */
  def exactNeighbors(vectors: DataFrame, vecCol: String, idCol: String,
                     queries: DataFrame, k: Int): DataFrame = {
    val pairs = vectors.join(broadcast(queries))
      .where(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol).as("id"),
        squaredL2F(col(vecCol), col("qvec")).as("sq_dist"))
    pairs.groupBy(col("qid"))
      .agg(TopKAggregator.topK(k)(col("sq_dist"), col("id")).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("qid"), col("hit.id").as("id"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** The nprobe-recall curve: one row per nprobe 1..P with the fraction
    * of true (query, neighbor) pairs whose neighbor is a candidate at
    * that setting. `codes` needs only (id, partition) — the stored codes
    * table's narrow projection. Output (nprobe, n_hits, n_pairs, recall)
    * ascending by nprobe; recall is monotone and reaches 1.0 at P. */
  def nprobeRecallCurve(vectors: DataFrame, vecCol: String, idCol: String,
                        codes: DataFrame, model: IvfPqModel, k: Int,
                        sampleN: Int, seed: String = "cal"): DataFrame = {
    val p = model.config.numPartitions
    val queries = sampleQueries(vectors, vecCol, idCol, sampleN, seed)
    val truth = exactNeighbors(vectors, vecCol, idCol, queries, k)
    // neighbor's home cell (2-col join), then its position in the
    // query's full cell ordering — topCellsL2 with nprobe = P
    val flat = model.partitionCentroids.flatten.toSeq
    val ranked = truth
      .join(codes.select(col("id"), col("partition")), "id")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("id"),
        array_position(topCellsL2(col("qvec"), flat, p),
          col("partition").cast("long")).as("probe_rank"))
    val perRank = ranked.groupBy(col("probe_rank"))
      .agg(count(lit(1)).as("n_at_rank"))
    val total = ranked.agg(count(lit(1)).cast("long").as("n_pairs"))
    // dense 1..P axis; cumulative hits via a window over ≤ P rows
    val axis = vectors.sparkSession.range(1, p + 1)
      .select(col("id").as("nprobe"))
    axis.join(perRank, col("nprobe") === col("probe_rank"), "left")
      .select(col("nprobe"), coalesce(col("n_at_rank"), lit(0L)).as("n_at"))
      .withColumn("n_hits", sum(col("n_at"))
        .over(Window.orderBy(col("nprobe"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("nprobe"), col("n_hits").cast("long").as("n_hits"),
        col("n_pairs"),
        (col("n_hits").cast("double") / col("n_pairs")).as("recall"))
      .orderBy("nprobe")
  }

  /** Smallest nprobe whose curve recall reaches `targetRecall`. The
    * curve ends at recall 1.0 (probe ranks are ≤ P by construction), so
    * a target ≤ 1 always resolves; targets > 1 are refused. */
  def recommend(curve: DataFrame, targetRecall: Double): Int = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"target recall must be in (0, 1], got $targetRecall")
    val hit = curve.where(col("recall") >= targetRecall)
      .orderBy("nprobe").select("nprobe").limit(1).collect()
    require(hit.nonEmpty,
      "empty calibration curve — no (query, neighbor) pairs; is the " +
        "corpus smaller than the sample?")
    hit.head.getLong(0).toInt
  }

  /** One-shot calibration: build the curve, pick the smallest nprobe
    * promising `targetRecall`, return (nprobe, curve). */
  def calibrateNprobe(vectors: DataFrame, vecCol: String, idCol: String,
                      codes: DataFrame, model: IvfPqModel, k: Int,
                      sampleN: Int, targetRecall: Double,
                      seed: String = "cal"): (Int, DataFrame) = {
    val curve = nprobeRecallCurve(vectors, vecCol, idCol, codes, model, k,
      sampleN, seed)
    (recommend(curve, targetRecall), curve)
  }
}
