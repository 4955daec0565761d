package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier treatment: winsorization — clamp a value
  * column to its group's [lo, hi] order-statistic bounds — the standard
  * guard before any mean/variance-based downstream signal (quality
  * scores, mixture weights) is skewed by a handful of corrupt rows.
  *
  * Quantiles are EXACT ORDER STATISTICS by integer rank arithmetic
  * (rank ⌈q·n⌉ in (value, id) order), not interpolated percentiles —
  * deterministic, engine-portable (the same rows win in any SQL
  * engine), and tie-stable. The bounds pass is a per-group
  * sort (fine at the gated scale; a 100 TB run swaps in
  * `approx_percentile`, which needs no sort, behind the same join —
  * documented trade-off, the clip plan is unchanged). The bounds table
  * is |groups| rows — broadcast back onto the stream, so the clip
  * itself is a narrow codegen projection over the corpus.
  */
object Outliers {

  /** Per-group [lo, hi] bounds at ranks ⌈loNum/loDen·n⌉ and
    * ⌈hiNum/hiDen·n⌉ (1-based, (value, id)-ordered). Output:
    * (groupCol, lo, hi, n). */
  def clipBounds(df: DataFrame, groupCol: String, valueCol: String,
                 idCol: String, loNum: Int, loDen: Int,
                 hiNum: Int, hiDen: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(idCol))
    val cw = Window.partitionBy(groupCol)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(cw))
      .withColumn("i_lo", expr(s"(n * $loNum + ${loDen - 1}) div $loDen"))
      .withColumn("i_hi", expr(s"(n * $hiNum + ${hiDen - 1}) div $hiDen"))
      .groupBy(groupCol)
      .agg(max(when(col("rn") === col("i_lo"), col(valueCol))).as("lo"),
        max(when(col("rn") === col("i_hi"), col(valueCol))).as("hi"),
        max(col("n")).as("n"))
  }

  /** Winsorized rows: every row keeps its identity, `valueCol` is
    * clamped into its group's bounds, and `clipped` ∈ {-1, 0, 1} marks
    * which side (if any) was clamped. Clamped values are always one of
    * the group's own input values (the bound itself), never an
    * interpolation. Default bounds: [5th, 95th] percentile ranks. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                idCol: String, loNum: Int = 1, loDen: Int = 20,
                hiNum: Int = 19, hiDen: Int = 20): DataFrame = {
    val bounds =
      clipBounds(df, groupCol, valueCol, idCol, loNum, loDen, hiNum, hiDen)
        .select(col(groupCol), col("lo"), col("hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("clipped",
        when(col(valueCol) < col("lo"), -1L)
          .when(col(valueCol) > col("hi"), 1L).otherwise(0L))
      .withColumn(valueCol,
        least(greatest(col(valueCol), col("lo")), col("hi")))
      .drop("lo", "hi")
  }

  /** Exact per-group LOWER MEDIAN (rank ⌈n/2⌉ in (value, id) order) of
    * an arbitrary value expression — the deterministic, engine-portable
    * median convention shared with [[clipBounds]]. */
  private def groupMedian(df: DataFrame, groupCol: String, valueCol: String,
                          idCol: String, out: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(idCol))
    val cw = Window.partitionBy(groupCol)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(cw))
      .groupBy(groupCol)
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col(valueCol)))
        .as(out))
  }

  /** Robust per-group outlier flags by MEDIAN ABSOLUTE DEVIATION: a row
    * is an outlier iff |x − median| > k·MAD (both statistics exact
    * lower-median order statistics — deterministic and engine-portable;
    * mean/stddev would let one corrupt row drag its own threshold,
    * which is the failure MAD exists to prevent). Two bounded
    * window-sort passes over the group plus two \|groups\|-row
    * broadcast joins; every intermediate (median is an input value,
    * deviation a single subtraction, MAD one of the deviations) is
    * exactly representable, so the strict-> flag is portable too.
    * Output: input columns + `is_outlier` ∈ {0, 1}. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  idCol: String, k: Double = 3.0): DataFrame = {
    val med = groupMedian(df, groupCol, valueCol, idCol, "med")
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = groupMedian(withDev, groupCol, "dev", idCol, "mad")
    withDev.join(broadcast(mad), Seq(groupCol))
      .withColumn("is_outlier",
        when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L))
      .drop("med", "dev", "mad")
  }
}
