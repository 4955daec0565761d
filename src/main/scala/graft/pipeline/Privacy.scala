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
