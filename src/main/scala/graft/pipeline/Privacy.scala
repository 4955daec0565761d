package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity screening for a release candidate (Sweeney 2002): a row
  * is safe only if at least `k` rows share its full quasi-identifier
  * combination — the structured-data complement of [[Redact]]'s
  * free-text PII scrub, run before training data derived from user
  * records leaves the boundary.
  *
  * Scale shape: ONE map-side-combined groupBy over the quasi columns
  * (group relation is domain-sized, not corpus-sized) and, for the
  * filtering form, one equality join of the corpus back against the
  * qualifying groups — AQE broadcasts the group side when small. No
  * window over the raw rows, no driver state.
  */
object Privacy {

  /** Per-group report: the quasi-identifier columns + `n` (group size)
    * + `is_k_anon` (1 iff n ≥ k). The audit artifact. */
  def kAnonymityGroups(df: DataFrame, quasiCols: Seq[String],
                       k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("is_k_anon", (col("n") >= k).cast("int"))
  }

  /** The releasable subset: rows whose quasi-identifier group reaches
    * size k. Everything else is SUPPRESSED (the conservative cell-
    * suppression baseline; coarsen with [[generalized]] first to keep
    * more rows). */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String],
                 k: Long): DataFrame = {
    val ok = kAnonymityGroups(df, quasiCols, k)
      .where(col("is_k_anon") === 1)
      .select(quasiCols.map(col): _*)
    df.join(ok, quasiCols, "left_semi")
  }

  /** l-diversity screening (Machanavajjhala et al. 2007): k-anonymity
    * alone fails when an equivalence class, however large, is
    * HOMOGENEOUS in the sensitive attribute — every member shares the
    * same diagnosis/salary band and group size protects nothing. A
    * group is l-diverse iff it contains at least `l` DISTINCT
    * well-represented sensitive values.
    *
    * Per-group report: quasi columns + `n` (group size) +
    * `n_sensitive` (distinct sensitive values, NULL counted as absent)
    * + `is_l_diverse` (1 iff n_sensitive ≥ l). Same scale shape as
    * [[kAnonymityGroups]] — one map-side-combined groupBy whose
    * output is domain-sized (the distinct aggregate adds one
    * partial-dedup pass over (quasi, sensitive), still domain-sized). */
  def lDiversityGroups(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("is_l_diverse", (col("n_sensitive") >= l).cast("int"))
  }

  /** The releasable subset under l-diversity: rows whose
    * quasi-identifier group carries at least `l` distinct sensitive
    * values. Compose AFTER [[kAnonymize]] (or check both reports) —
    * the two properties are independent. */
  def lDiversify(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    val ok = lDiversityGroups(df, quasiCols, sensitiveCol, l)
      .where(col("is_l_diverse") === 1)
      .select(quasiCols.map(col): _*)
    df.join(ok, quasiCols, "left_semi")
  }

  /** t-closeness screening (Li, Li & Venkatasubramanian 2007) — the
    * third rung of the ladder: an l-diverse group still leaks when its
    * sensitive DISTRIBUTION differs sharply from the table's (all l
    * values present, but 95% of the group in the top salary band). A
    * group is t-close iff the earth-mover's distance between its
    * sensitive distribution and the global one is ≤ t.
    *
    * For an ORDERED sensitive attribute with unit adjacent ground
    * distance, EMD = (1/(m−1))·Σ_i |cum_p(i) − cum_q(i)| over the m
    * globally observed values — computed here in EXACT integer
    * cross-multiplied form (the [[Drift.ksFromHistograms]] pattern):
    *
    *   emd_num = Σ_i |cumG_i·N − cumA_i·n_g|
    *   EMD     = emd_num / (n_g · N · (m−1))
    *
    * and the verdict `is_t_close` = [emd_num·10⁶ ≤ t_x1e6·n_g·N·(m−1)]
    * stays all-integer. Overflow bound: keep n_g·N·(m−1)·10⁶ below
    * ~9e18 (beyond that, pre-band the sensitive domain — which a
    * t-closeness release does anyway).
    *
    * Scale shape: one groupBy over (quasi, value) and one over value
    * (both domain-sized, map-side combined), a groups×values grid join
    * (metadata-sized), and per-group cumulative windows partitioned by
    * the quasi key; the global cumulative window runs on the
    * DOMAIN-sized value list (same documented single-partition bound
    * as [[Sketches.quantilesFromHistogram]]). NULL sensitive values
    * are excluded on both sides. This contract fits CATEGORICAL
    * sensitive attributes; for high-cardinality numeric columns use
    * [[tClosenessBuckets]], which bounds the grid by a bucket width.
    *
    * Output: quasi cols + n (group size) + n_values (m) + emd_num +
    * is_t_close. */
  def tClosenessGroups(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, tX1e6: Long): DataFrame = {
    tClosenessGuards(quasiCols, sensitiveCol, tX1e6)
    val qs = quasiCols.map(col)
    val base = df.where(col(sensitiveCol).isNotNull)
      .select(qs :+ col(sensitiveCol).cast("long").as("v"): _*)
    tClosenessFromCells(
      base.groupBy(qs :+ col("v"): _*).agg(count(lit(1)).as("cnt")),
      quasiCols, tX1e6)
  }

  /** BUCKETED t-closeness for NUMERIC sensitive columns — the
    * scale-safe variant when the sensitive domain is high-cardinality
    * (raw salaries, balances, ages in days): [[tClosenessGroups]]
    * grids groups × every DISTINCT value, correct for categorical
    * domains but corpus-shaped when the domain is effectively
    * continuous. Here the sensitive value folds into fixed-width
    * buckets first ([[generalized]]'s floor-mod rule, engine-exact for
    * negatives), and the SAME exact-integer EMD runs over bucket
    * categories — the grid is groups × (domain span / width), bounded
    * by the caller's width choice, and the ground distance becomes one
    * bucket step, the standard histogram-EMD trade. Equivalent by
    * construction to running [[tClosenessGroups]] on a pre-bucketed
    * column (spec-pinned). */
  def tClosenessBuckets(df: DataFrame, quasiCols: Seq[String],
                        sensitiveCol: String, tX1e6: Long,
                        bucketWidth: Long): DataFrame = {
    tClosenessGuards(quasiCols, sensitiveCol, tX1e6)
    require(bucketWidth >= 1, s"bucket width must be >= 1, got $bucketWidth")
    val qs = quasiCols.map(col)
    val base = df.where(col(sensitiveCol).isNotNull)
      .select(qs :+ generalized(col(sensitiveCol).cast("long"),
        bucketWidth).as("v"): _*)
    tClosenessFromCells(
      base.groupBy(qs :+ col("v"): _*).agg(count(lit(1)).as("cnt")),
      quasiCols, tX1e6)
  }

  /** t-closeness from MERGEABLE per-cell counts — the state form
    * shared with [[Drift.ksFromHistograms]]: `cells` is
    * (quasi…, v, cnt), additive under union (shards/days merge by
    * summing counts per (quasi, v) — done here defensively), so the
    * audit composes with incremental pipelines that maintain cell
    * histograms instead of rescanning rows. [[tClosenessGroups]] and
    * [[tClosenessBuckets]] both delegate to this core. */
  def tClosenessFromCellCounts(cells: DataFrame, quasiCols: Seq[String],
                               sensitiveCol: String,
                               tX1e6: Long): DataFrame = {
    tClosenessGuards(quasiCols, sensitiveCol, tX1e6)
    val qs = quasiCols.map(col)
    tClosenessFromCells(
      cells.where(col(sensitiveCol).isNotNull)
        .select(qs ++ Seq(col(sensitiveCol).cast("long").as("v"),
          col("cnt").cast("long").as("cnt")): _*)
        .groupBy(qs :+ col("v"): _*).agg(sum(col("cnt")).as("cnt")),
      quasiCols, tX1e6)
  }

  private def tClosenessGuards(quasiCols: Seq[String],
                               sensitiveCol: String, tX1e6: Long): Unit = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(tX1e6 >= 0, s"t_x1e6 must be >= 0, got $tX1e6")
    val reserved = Seq("v", "a", "g", "n", "m", "cnt", "cuma", "cumg",
      "n_total", "n_values", "emd_num", "is_t_close")
    val clash = quasiCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"quasi columns ${clash.mkString(", ")} collide with " +
        s"t-closeness internal/output names (${reserved.mkString(", ")}) — rename them first")
  }

  /** Shared exact-integer EMD core over (quasi…, v, cnt) cells. */
  private def tClosenessFromCells(cells: DataFrame, quasiCols: Seq[String],
                                  tX1e6: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = quasiCols.map(col)
    // global ordered histogram with cumulative counts (domain-sized)
    val wAll = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val glob = cells.groupBy("v").agg(sum(col("cnt")).as("a"))
      .withColumn("cuma", sum(col("a")).over(wAll))
      .withColumn("n_total", sum(col("a")).over())
      .withColumn("m", count(lit(1)).over())
    // groups × global values grid, group counts filled with zeros
    val groups = cells.groupBy(qs: _*).agg(sum(col("cnt")).as("n"))
    val cnts = cells.select(qs ++ Seq(col("v"), col("cnt").as("g")): _*)
    val wGrp = Window.partitionBy(quasiCols.map(col): _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups.crossJoin(glob)
      .join(cnts, quasiCols :+ "v", "left")
      .withColumn("g", coalesce(col("g"), lit(0L)))
      .withColumn("cumg", sum(col("g")).over(wGrp))
      .groupBy(qs :+ col("n") :+ col("n_total") :+ col("m"): _*)
      .agg(sum(abs(col("cumg") * col("n_total") -
        col("cuma") * col("n"))).as("emd_num"))
      .select(qs ++ Seq(col("n"), col("m").as("n_values"),
        col("emd_num"),
        when(col("m") <= 1, lit(1)).otherwise(
          (col("emd_num") * lit(1000000L) <=
            lit(tX1e6) * col("n") * col("n_total") * (col("m") - 1))
            .cast("int")).as("is_t_close")): _*)
  }

  /** Salted pseudonymization: a CONSISTENT opaque token per value —
    * the same id maps to the same token across tables and batches (so
    * joins still work on the released data), but without the secret
    * salt the mapping cannot be replayed from the public id space.
    * Token = first 16 hex chars of md5(salt ‖ ':' ‖ value) — 64 bits,
    * birthday-safe to ~billions of distinct values; pure codegen
    * projection, engine-exact. (Not a formal HMAC — fine for
    * fixed-format identifiers, which is this function's contract;
    * secrets with attacker-chosen suffixes need a real MAC.) NULL
    * stays NULL. */
  def pseudonym(value: Column, salt: String): Column = {
    require(salt.nonEmpty, "salt must be non-empty")
    when(value.isNull, lit(null).cast("string"))
      .otherwise(substring(
        md5(concat(lit(s"$salt:"), value.cast("string")).cast("binary")),
        1, 16))
  }

  /** Generalization step for a numeric quasi-identifier: band values
    * to width-`width` buckets (floor), trading precision for bigger
    * groups — rerun the report on the banded column to measure the
    * anonymity gained. */
  def generalized(c: Column, width: Long): Column = {
    require(width >= 1, s"width must be >= 1, got $width")
    // c − (c mod width) = width·⌊c/width⌋ in pure integer arithmetic
    // (pmod keeps the identity on negatives too — no double round trip)
    (c - pmod(c, lit(width))).cast("long")
  }
}
