package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.litLongs

/** Frequency sketching — the third sketch family beside HLL distinct
  * counting (`stats_approx_distinct`) and quantile summaries
  * (`stats_approx_quantiles`): a count-min sketch (Cormode & Muthu-
  * krishnan 2005) estimates per-item frequencies in sublinear space with
  * one-sided error (never an undercount, overcount ≤ εN with probability
  * 1 − δ for width ⌈e/ε⌉ and depth ⌈ln 1/δ⌉).
  *
  * Scale shape: the build explodes `depth` (row, bucket) cells per item
  * occurrence and count-combines map-side, so the shuffle carries at
  * most depth×width fixed-width rows per upstream partition regardless
  * of corpus size; the finished sketch is depth×width longs on the
  * driver (a few KB), shipped back as a plan literal for lookups — the
  * same build-once-probe-anywhere discipline as
  * [[graft.operators.BloomJoin]].
  */
object Sketches {

  // ------------------------------------ exact quantiles via value counts

  /** Mergeable value histogram (v, cnt) over `valueCol` — the EXACT
    * quantile state for bounded-domain columns (lengths, counts, scores
    * quantized to integers): counts merge additively across batches
    * (the [[Dedup.lineDocCounts]] incremental-state pattern), so a
    * 100 TB corpus maintains a domain-sized relation instead of
    * re-scanning history. The groupBy shuffles the DOMAIN, never the
    * corpus. NULLs are excluded: a null bucket would inflate n_total in
    * the quantile rank rule, and Spark's window sort puts NULLS FIRST
    * where DuckDB puts them LAST — quantiles are over observed values. */
  def valueHistogram(df: DataFrame, valueCol: String): DataFrame =
    df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))

  /** Additive merge of two value histograms. */
  def mergeValueHistograms(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("v").agg(sum(col("cnt")).as("cnt"))

  /** Exact discrete quantiles from a value histogram: for each
    * q ∈ `qsX100` (integer percent, 1..100), the smallest value whose
    * cumulative count reaches rank ⌈q·n/100⌉ — all-integer rank
    * arithmetic, so engines agree bit-for-bit. The cumulative window
    * sorts the DOMAIN (one partition of domain-sized rows — fine for
    * bounded domains, which is this operator's contract; unbounded
    * doubles belong in `percentile_approx`). Output:
    * (q_x100, value, rank, n_total). */
  def quantilesFromHistogram(hist: DataFrame,
                             qsX100: Seq[Int]): DataFrame = {
    require(qsX100.nonEmpty && qsX100.forall(q => q >= 1 && q <= 100),
      s"quantiles must be integer percents in 1..100: $qsX100")
    val spark = hist.sparkSession
    import spark.implicits._
    val cum = hist.withColumn("cum", sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
    val tot = hist.agg(coalesce(sum(col("cnt")), lit(0L)).as("n_total"))
    qsX100.map(_.toLong).toDF("q_x100")
      .crossJoin(broadcast(tot))
      .withColumn("rank", expr("(q_x100 * n_total + 99) div 100"))
      .join(cum, col("cum") >= col("rank"))
      .groupBy(col("q_x100"), col("rank"), col("n_total"))
      .agg(min(col("v")).as("value"))
      .select("q_x100", "value", "rank", "n_total")
  }

  /** [[valueHistogram]] + [[quantilesFromHistogram]] in one call. */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qsX100: Seq[Int]): DataFrame =
    quantilesFromHistogram(valueHistogram(df, valueCol), qsX100)

  /** Per-GROUP exact discrete quantiles: the same integer rank rule as
    * [[quantilesFromHistogram]], with the cumulative window partitioned
    * by group — its sort is bounded by each group's value DOMAIN, never
    * the corpus, and the (group, v) histogram shuffle is the only wide
    * exchange. Output: (groupCol, q_x100, value, rank, n_total), one row
    * per (group, q). */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
                            valueCol: String, qsX100: Seq[Int]): DataFrame = {
    require(qsX100.nonEmpty && qsX100.forall(q => q >= 1 && q <= 100),
      s"quantiles must be integer percents in 1..100: $qsX100")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("v"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n_total", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
    cum.crossJoin(broadcast(qsX100.map(_.toLong).toDF("q_x100")))
      .withColumn("rank", expr("(q_x100 * n_total + 99) div 100"))
      .where(col("cum") >= col("rank"))
      .groupBy(col(groupCol), col("q_x100"), col("rank"), col("n_total"))
      .agg(min(col("v")).as("value"))
      .select(groupCol, "q_x100", "value", "rank", "n_total")
  }

  /** The finished sketch: depth×width counters, row-major. Estimates
    * run as Columns ([[countMinEstimate]]) so lookup and build share one
    * hash definition (Spark's xxhash64). */
  final case class CountMin(depth: Int, width: Int, table: Array[Long]) {
    require(table.length == depth * width, "table shape mismatch")
  }

  /** Build a count-min sketch over a string item column. One job. */
  def countMinBuild(items: DataFrame, itemCol: String,
                    depth: Int, width: Int): CountMin = {
    require(depth >= 1 && depth <= 8 && width >= 2)
    val cells = (0 until depth).map { j =>
      struct(lit(j).as("r"),
        pmod(xxhash64(col(itemCol), lit(j)), lit(width.toLong)).as("b"))
    }
    val rows = items
      .select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.r").as("r"), col("c.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val table = new Array[Long](depth * width)
    rows.foreach(r => table(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))
    CountMin(depth, width, table)
  }

  /** Estimate column: min over the sketch rows for each item — a codegen
    * projection against the literal table (no join, no shuffle). Uses
    * the same xxhash64(item, row) bucketing as the build. */
  def countMinEstimate(item: Column, cm: CountMin): Column = {
    val tableLit = litLongs(cm.table)
    (0 until cm.depth).map { j =>
      element_at(tableLit,
        (lit(j.toLong * cm.width) +
          pmod(xxhash64(item, lit(j)), lit(cm.width.toLong)) + 1L).cast("int"))
    }.reduce(least(_, _))
  }

  /** MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    * Spark's `hll_sketch_agg`): one sketch per group, materialized as a
    * binary column a caller can persist beside the data. This is the
    * 100 TB rollup idiom `approx_count_distinct` cannot express: daily
    * sketches are built once in the daily load, and ANY coarser distinct
    * count — week, quarter, all-time — is a [[hllUnionEstimate]] over a
    * handful of finished sketches, never a rescan of the raw corpus.
    * (`approx_count_distinct` answers one fixed grouping per scan and
    * discards its state.)
    *
    * lgK = 12 keeps the worst-case sketch at ~4 KB with ~1.6% standard
    * error; below ~k·3/4 distincts the sketch is still in its exact
    * sparse mode, so small-group estimates are exact integers. */
  def hllByGroup(df: DataFrame, groupCol: String, valueCol: String,
                 lgK: Int = 12): DataFrame =
    df.groupBy(groupCol)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))

  /** Per-group rounded estimates from finished sketches. */
  def hllEstimates(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.select(col(groupCol),
      round(hll_sketch_estimate(col("sketch"))).cast("long").as("n_distinct"))

  /** Union ALL finished sketches into one estimate — the rollup that
    * never touches the raw data. One row: (n_distinct). */
  def hllUnionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(round(hll_sketch_estimate(
      hll_union_agg(col("sketch"), false))).cast("long").as("n_distinct"))

  /** EXACT equi-join output size from two key histograms:
    * |A ⋈ B| = Σ_k c_A(k)·c_B(k) — the cardinality a planner wants
    * BEFORE committing to a join strategy (and the cross-table
    * sibling of F₂ = self-join size). Histograms are the same
    * additively-mergeable (v, cnt) state as [[valueHistogram]], so the
    * prediction costs one key-domain join over persisted stats — the
    * corpora are never rescanned, and a daily ingest just folds its
    * batch counts in. Output one row: (join_rows decimal(20,0),
    * n_keys_joint). Skew diagnosis: run [[heavyHitters]] on the same
    * histograms when the predicted size explodes. */
  def joinSizeFromHistograms(aHist: DataFrame,
                             bHist: DataFrame): DataFrame =
    aHist.select(col("v"), col("cnt").as("ca"))
      .join(bHist.select(col("v"), col("cnt").as("cb")), Seq("v"))
      .agg(
        coalesce(sum((col("ca") * col("cb")).cast("decimal(20,0)")),
          lit(0L).cast("decimal(20,0)")).cast("decimal(20,0)")
          .as("join_rows"),
        count(lit(1)).as("n_keys_joint"))

  // ---------------------------------------------- second frequency moment

  /** AMS sign hash: parity of a DEGREE-3 polynomial over
    * GF(2³¹−1) — 4-wise independent, the independence degree the AMS
    * variance bound (Var ≤ 2F₂²/s) actually requires; an affine hash
    * is only 2-wise and lets the estimator blow up on small domains.
    * Every step is mod-reduced before the next multiply so all
    * intermediates stay in 64 bits for ANY long input, and the whole
    * chain is plain integer SQL any engine reproduces bit-for-bit.
    * Per-sketch coefficients come from a splitmix64 stream seeded by
    * (sketch, slot) — each sketch gets its OWN polynomial. (Deriving
    * all four coefficients as multiples of one per-sketch factor would
    * make every sketch a scalar multiple of a single polynomial over
    * GF(p): identical parities across sketches, a fully correlated
    * estimator. Caught by the SketchesSpec accuracy bound.) */
  private val AmsP = 2147483647L // Mersenne prime 2³¹ − 1

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Coefficient `k` (0 = constant, 1..3 = degree) of sketch `j`'s
    * sign polynomial, in [0, P). Public so an oracle replica can
    * inline the identical literals. */
  def amsCoef(j: Int, k: Int): Long =
    java.lang.Math.floorMod(splitmix(j.toLong * 4 + k), AmsP)

  private def amsSign(x: Column, j: Int): Column = {
    val a1 = amsCoef(j, 1)
    val a2 = amsCoef(j, 2)
    val a3 = amsCoef(j, 3) % (AmsP - 1) + 1 // leading coef never 0
    val b = amsCoef(j, 0)
    val p = lit(AmsP)
    val t = pmod(x, p)
    val t2 = pmod(t * t, p)
    val t3 = pmod(t2 * t, p)
    val h = pmod(pmod(t3 * lit(a3), p) + pmod(t2 * lit(a2), p) +
      pmod(t * lit(a1), p) + lit(b), p)
    lit(1L) - lit(2L) * pmod(h, lit(2L))
  }

  /** Exact second frequency moment F₂ = Σ_x c_x² — the skew/self-join-
    * size statistic (F₂ is exactly the row count of a self-equi-join on
    * the column, and the numerator of a collision-probability estimate).
    * One map-side-combined groupBy over the item domain, then a 1-row
    * fold in decimal(20,0) (F₂ ≤ n², so 64-bit overflows past ~3e9
    * rows). */
  def f2Exact(df: DataFrame, itemCol: String): DataFrame =
    df.where(col(itemCol).isNotNull)
      .groupBy(col(itemCol)).agg(count(lit(1)).as("c"))
      .agg(sum((col("c") * col("c")).cast("decimal(20,0)"))
        .cast("decimal(20,0)").as("f2"))

  /** AMS linear sketch state (Alon–Matias–Szegedy 1996): for each of
    * `numSketches` independent ±1 sign hashes, the running sum
    * Σ_rows sign_j(x). Each sum's SQUARE is an unbiased F₂ estimate.
    *
    * This is the mergeable-state entry point: the sums are ADDITIVE
    * across batches/partitions/days (union the states and re-sum), so
    * a streaming ingest maintains `numSketches` longs instead of the
    * item-domain histogram [[f2Exact]] needs. ONE corpus scan, one
    * 1-row aggregate — no shuffle beyond the s-column fold. Items must
    * be integral (any long — the hash mod-reduces before multiplying).
    * Output: (sketch_id, s_sum). */
  def f2SketchState(df: DataFrame, itemCol: String,
                    numSketches: Int): DataFrame = {
    require(numSketches >= 1 && numSketches <= 64,
      s"numSketches must be in [1, 64], got $numSketches")
    val x = col(itemCol).cast("long")
    val sums = (0 until numSketches).map(j =>
      sum(amsSign(x, j)).as(s"s$j"))
    df.where(col(itemCol).isNotNull)
      .agg(sums.head, sums.tail: _*)
      .select(explode(array((0 until numSketches).map(j =>
        struct(lit(j.toLong).as("sketch_id"),
          coalesce(col(s"s$j"), lit(0L)).as("s_sum"))): _*)).as("e"))
      .select(col("e.sketch_id"), col("e.s_sum"))
  }

  /** Additive merge of two AMS states (same numSketches contract). */
  def mergeF2States(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("sketch_id")
      .agg(sum(col("s_sum")).as("s_sum"))

  /** F₂ estimate from a finished state: mean of the per-sketch squares
    * (all-integer: floor division by the sketch count). One row:
    * (f2_est, n_sketches). Relative std-error ≈ √(2/numSketches).
    * Each square widens to decimal(20,0) before summing — |s_sum| can
    * reach the row count, so the 64-bit square wraps past ~3e9 rows
    * (the same bound [[f2Exact]] widens for); the final estimate still
    * lands in a BIGINT because the mean of squares is ≤ the true F₂
    * magnitude the exact path already promises fits. */
  def f2FromState(state: DataFrame): DataFrame =
    state.agg(
      expr("CAST(sum(CAST(s_sum AS DECIMAL(20,0)) * s_sum) " +
        "div count(*) AS BIGINT)").as("f2_est"),
      count(lit(1)).as("n_sketches"))

  // ------------------------------------------------------- heavy hitters

  /** Misra-Gries buffer: ≤ k−1 (item, lower-bound count) summaries. */
  final case class MgBuf(m: Map[String, Long])

  /** Mergeable Misra-Gries heavy-hitter summary (Misra & Gries 1982;
    * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012):
    * ≤ k−1 counters per task, and ANY merge order preserves the
    * guarantee that every item with true frequency > n/k is still in
    * the summary. Counts in the buffer are undercounts (by ≤ n/k), so
    * the summary alone nominates CANDIDATES — [[heavyHitters]] adds the
    * exact second pass that makes the final answer deterministic and
    * exact, independent of Spark's nondeterministic merge order. */
  private class MisraGries(k: Int) extends Aggregator[String, MgBuf, Seq[String]] {
    override def zero: MgBuf = MgBuf(Map.empty)
    override def reduce(b: MgBuf, item: String): MgBuf =
      b.m.get(item) match {
        case Some(c) => MgBuf(b.m.updated(item, c + 1))
        case None if b.m.size < k - 1 => MgBuf(b.m.updated(item, 1L))
        case None => // decrement-all; drop zeros
          MgBuf(b.m.collect { case (i, c) if c > 1 => (i, c - 1L) })
      }
    override def merge(x: MgBuf, y: MgBuf): MgBuf = {
      val s = (x.m.keySet ++ y.m.keySet).iterator
        .map(i => i -> (x.m.getOrElse(i, 0L) + y.m.getOrElse(i, 0L))).toMap
      if (s.size <= k - 1) MgBuf(s)
      else { // subtract the k-th largest summed count, drop non-positive
        val kth = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
        MgBuf(s.collect { case (i, c) if c > kth => (i, c - kth) })
      }
    }
    override def finish(b: MgBuf): Seq[String] = b.m.keys.toSeq.sorted
    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Candidate heavy hitters: array<string> column (one row per group
    * scope it aggregates over), sorted for display stability. */
  def misraGriesCandidates(k: Int)(item: Column): Column = {
    require(k >= 2, s"Misra-Gries needs k >= 2, got $k")
    udaf(new MisraGries(k), Encoders.STRING).apply(item)
  }

  /** EXACT heavy hitters — every item with frequency strictly above
    * n/k — in two bounded passes, never a full groupBy over the domain:
    *
    *   1. one scan: Misra-Gries candidates (≤ k−1 survivors regardless
    *      of merge order) + the total count n, in the SAME aggregate;
    *   2. one scan: exact counts of candidate items only (broadcast
    *      semi-join of the item stream against ≤ k−1 candidate keys),
    *      filtered by cnt·k > n.
    *
    * The MG no-false-negative guarantee makes pass 2's output exactly
    * the true heavy-hitter set — the nondeterminism of partial-aggregate
    * merge order affects only which sub-threshold candidates get
    * exactly counted and then discarded. At 100 TB the shuffle carries
    * ≤ k−1 counters per task in pass 1 and ≤ k−1 groups in pass 2 —
    * the full-domain `groupBy(item).count` this replaces would shuffle
    * every distinct item. Output: (item, cnt) for cnt·k > n. */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val firstPass = items.agg(
      misraGriesCandidates(k)(col(itemCol)).as("cand"),
      count(lit(1)).as("n")).collect()(0)
    val cand = firstPass.getSeq[String](0)
    val n = firstPass.getLong(1)
    items.where(col(itemCol).isin(cand: _*))
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n)
  }

  /** Per-GROUP exact heavy hitters: every (group, item) whose frequency
    * exceeds n_group/k — [[heavyHitters]]' two-pass run per group. Pass
    * 1 is ONE map-side-combined Misra-Gries aggregate per group (≤ k
    * counters of state each — the MG guarantee keeps every
    * over-threshold item among the candidates); pass 2 joins the
    * exploded (group, candidate) relation back and recounts exactly.
    * The full (group, item) distinct relation is never materialized —
    * at 100 TB with open item domains that is the point. Output:
    * (groupCol, item, cnt, n_group). */
  def heavyHittersByGroup(items: DataFrame, groupCol: String,
                          itemCol: String, k: Int): DataFrame = {
    val cand = items.groupBy(col(groupCol))
      .agg(misraGriesCandidates(k)(col(itemCol)).as("cand"),
        count(lit(1)).as("n_group"))
      .select(col(groupCol), col("n_group"),
        explode(col("cand")).as("item"))
    items.select(col(groupCol), col(itemCol).as("item"))
      .join(cand, Seq(groupCol, "item"))
      .groupBy(col(groupCol), col("item"))
      .agg(count(lit(1)).as("cnt"), max(col("n_group")).as("n_group"))
      .where(col("cnt") * k > col("n_group"))
  }
}
