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
  * engine), and tie-stable. The window-based bounds pass is a per-group
  * sort — one task per group, a giant-group plan when the group key has
  * low cardinality; [[clipBoundsHist]]/[[winsorizeHist]]/
  * [[madOutliersHist]] are the 100 TB twins (identical statistics from
  * domain-sized value histograms, no corpus sort anywhere). The bounds
  * table is |groups| rows either way — broadcast back onto the stream,
  * so the clip itself is a narrow codegen projection over the corpus.
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

  /** The 100 TB twin of [[clipBounds]]: IDENTICAL bounds (the value at
    * rank r in (value, id) order is the smallest value whose cumulative
    * count reaches r — the id tie-break never changes which VALUE sits
    * at a rank), computed from a per-(group, value) HISTOGRAM instead
    * of a group-partitioned window over the corpus. The cumulative
    * window runs over the DISTINCT values per group — domain-sized,
    * never row-sized (the `equalFreqBucket` shape) — so no task ever
    * sorts a whole group.
    *
    * CARDINALITY CONTRACT (loud): ≤ `maxDistinct` distinct values per
    * group, asserted in-plan; raw high-cardinality values (nanosecond
    * floats) must be quantized upstream. Output: (groupCol, lo, hi, n),
    * exactly [[clipBounds]]. */
  def clipBoundsHist(df: DataFrame, groupCol: String, valueCol: String,
                     loNum: Int, loDen: Int, hiNum: Int, hiDen: Int,
                     maxDistinct: Long = 4L << 20): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(groupCol).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(groupCol)
    hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("n", sum(col("__c")).over(wTot))
      .withColumn("__nd", count(lit(1)).over(wTot))
      .where(assert_true(col("__nd") <= maxDistinct,
        lit(s"clipBoundsHist: more than $maxDistinct distinct values " +
          s"in one group — quantize the value upstream first")).isNull)
      .withColumn("i_lo", expr(s"(n * $loNum + ${loDen - 1}) div $loDen"))
      .withColumn("i_hi", expr(s"(n * $hiNum + ${hiDen - 1}) div $hiDen"))
      .groupBy(groupCol)
      .agg(min(when(col("__cum") >= col("i_lo"), col(valueCol))).as("lo"),
        min(when(col("__cum") >= col("i_hi"), col(valueCol))).as("hi"),
        max(col("n")).as("n"))
  }

  /** The 100 TB twin of [[winsorize]]: identical output — bounds come
    * from [[clipBoundsHist]] (exactly equal to [[clipBounds]]' order
    * statistics whenever the cardinality contract holds), the clip is
    * the same broadcast join + narrow projection. No idCol parameter:
    * bounds are pure value statistics, the exact form's id only breaks
    * window ties that cannot change the bound value. */
  def winsorizeHist(df: DataFrame, groupCol: String, valueCol: String,
                    loNum: Int = 1, loDen: Int = 20,
                    hiNum: Int = 19, hiDen: Int = 20,
                    maxDistinct: Long = 4L << 20): DataFrame = {
    val bounds = clipBoundsHist(df, groupCol, valueCol, loNum, loDen,
        hiNum, hiDen, maxDistinct)
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

  /** Per-group lower median from a (group, value) histogram — the
    * domain-bounded twin of [[groupMedian]] (identical value: the
    * median at rank ⌈n/2⌉ is the smallest value whose cumulative count
    * reaches it). Shares [[clipBoundsHist]]'s cardinality contract. */
  private def groupMedianHist(df: DataFrame, groupCol: String,
                              valueCol: String, out: String,
                              maxDistinct: Long): DataFrame =
    clipBoundsHist(df, groupCol, valueCol, 1, 2, 1, 2, maxDistinct)
      .select(col(groupCol), col("lo").as(out))

  /** The 100 TB twin of [[madOutliers]]: identical flags — both the
    * median and the MAD are value statistics the id tie-break cannot
    * change, so the two histogram passes ([[groupMedianHist]], each a
    * domain-sized cumulative window + |groups|-row broadcast) reproduce
    * the exact order statistics whenever the cardinality contract
    * holds. The deviation pass doubles the value domain at worst
    * (|x − med| folds pairs of values together or keeps them distinct),
    * so the same `maxDistinct` bound governs both passes. */
  def madOutliersHist(df: DataFrame, groupCol: String, valueCol: String,
                      k: Double = 3.0,
                      maxDistinct: Long = 4L << 20): DataFrame = {
    val med = groupMedianHist(df, groupCol, valueCol, "med", maxDistinct)
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = groupMedianHist(withDev, groupCol, "dev", "mad", maxDistinct)
    withDev.join(broadcast(mad), Seq(groupCol))
      .withColumn("is_outlier",
        when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L))
      .drop("med", "dev", "mad")
  }
}
