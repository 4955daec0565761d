package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style relation profiling: per-column row/null/distinct
  * counts and min/max, for ANY input relation — the schema-drift /
  * data-freshness companion to the rule-based [[Expectations]] gate
  * (profile tells you what the batch looks like; expectations tell you
  * whether it may publish).
  *
  * ONE aggregate produces every column's counters (Spark plans the
  * multi-column count-distinct via a single Expand: the scan is read
  * once, the shuffle carries one row group per column per partition).
  * For 100 TB profiles swap `exact = false`: approx_count_distinct
  * (HLL++) drops the Expand entirely and keeps the whole profile
  * map-side-combined.
  *
  * Output: (column, n_rows, n_nulls, n_distinct, min_str, max_str) —
  * one row per column, in schema order. min/max are rendered to
  * strings AFTER the typed aggregate, so the comparison semantics are
  * the column type's own; NULL-only (or empty) relations give NULL
  * min/max. n_distinct counts non-NULL values (SQL COUNT DISTINCT).
  */
object Profile {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "Profile.profile: zero-column relation")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"nn$i"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c)).cast("long")).as(s"nd$i"),
        min(col(c)).cast("string").as(s"mn$i"),
        max(col(c)).cast("string").as(s"mx$i"))
    }
    val all = count(lit(1)).as("n_rows") +: aggs
    val one = df.agg(all.head, all.tail: _*)
    one.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("pos"), lit(c).as("column"), col("n_rows"),
          col(s"nn$i").as("n_nulls"), col(s"nd$i").as("n_distinct"),
          col(s"mn$i").as("min_str"), col(s"mx$i").as("max_str"))
      }: _*)).as("kv"))
      .select(col("kv.pos"), col("kv.column"), col("kv.n_rows"),
        col("kv.n_nulls"), col("kv.n_distinct"),
        col("kv.min_str"), col("kv.max_str"))
      .orderBy("pos")
      .drop("pos")
  }

  /** Schema + statistics drift between two VERSIONS of a relation —
    * the data-contract monitor that pairs [[profile]] with
    * [[graft.pipeline.Drift]]'s distribution view: profiles both sides
    * (metadata-sized), full-outer joins on column name, and flags what
    * changed. `presence` marks schema evolution (added/dropped/kept);
    * for kept columns, `range_changed` compares min/max,
    * `distinct_changed` the exact cardinalities, and
    * `null_frac_changed` the null FRACTION via the cross-multiplied
    * integer identity n_nulls_a·n_rows_b ≠ n_nulls_b·n_rows_a (row
    * counts may legitimately differ between versions; the fraction is
    * the contract). Absent-side counters render as −1, keeping every
    * output column a non-null integer/string. */
  def compare(a: DataFrame, b: DataFrame, exact: Boolean = true): DataFrame = {
    val pa = profile(a, exact).select(col("column"),
      col("n_rows").as("n_rows_a"), col("n_nulls").as("n_nulls_a"),
      col("n_distinct").as("n_distinct_a"),
      col("min_str").as("min_a"), col("max_str").as("max_a"))
    val pb = profile(b, exact).select(col("column"),
      col("n_rows").as("n_rows_b"), col("n_nulls").as("n_nulls_b"),
      col("n_distinct").as("n_distinct_b"),
      col("min_str").as("min_b"), col("max_str").as("max_b"))
    val kept = col("n_rows_a").isNotNull && col("n_rows_b").isNotNull
    pa.join(pb, Seq("column"), "full_outer")
      .select(col("column"),
        when(col("n_rows_a").isNull, lit("added"))
          .when(col("n_rows_b").isNull, lit("dropped"))
          .otherwise(lit("kept")).as("presence"),
        coalesce(col("n_rows_a"), lit(-1L)).as("n_rows_a"),
        coalesce(col("n_rows_b"), lit(-1L)).as("n_rows_b"),
        coalesce(col("n_nulls_a"), lit(-1L)).as("n_nulls_a"),
        coalesce(col("n_nulls_b"), lit(-1L)).as("n_nulls_b"),
        coalesce(col("n_distinct_a"), lit(-1L)).as("n_distinct_a"),
        coalesce(col("n_distinct_b"), lit(-1L)).as("n_distinct_b"),
        when(kept && (!(col("min_a") <=> col("min_b")) ||
          !(col("max_a") <=> col("max_b"))), 1L).otherwise(0L)
          .as("range_changed"),
        when(kept && col("n_distinct_a") =!= col("n_distinct_b"), 1L)
          .otherwise(0L).as("distinct_changed"),
        // cross-multiply in decimal(38,0): counts are Longs (< 9.3e18),
        // so each product is < 8.6e37 and exactly representable — the
        // Long·Long form silently wraps once both factors pass ~3e9,
        // which multi-billion-row versions reach
        when(kept && col("n_nulls_a").cast("decimal(20,0)") *
          col("n_rows_b").cast("decimal(20,0)") =!=
          col("n_nulls_b").cast("decimal(20,0)") *
          col("n_rows_a").cast("decimal(20,0)"), 1L).otherwise(0L)
          .as("null_frac_changed"))
  }

  /** Mutual information between two DISCRETE columns — the
    * general-dependence complement to [[corrExact]]'s linear Pearson
    * (MI sees the U-shaped and categorical relationships r² scores as
    * 0). Per-cell contribution (c_xy/N)·ln(c_xy·N/(c_x·c_y)),
    * floor-scaled ×1e6 with the PSI discipline: counts exact integers,
    * ONE fixed-association double chain per cell, so engines agree
    * bit-for-bit. MI = Σ contribs ≥ 0 up to per-cell floor residue;
    * 0 ⇔ independent.
    *
    * Shape: one map-side-combined groupBy over the JOINT domain, then
    * marginals and N as window sums over that domain-sized cell
    * relation — the corpus is scanned once; nothing row-scale
    * shuffles. NULLs excluded on both sides. Output: (x, y, n_xy,
    * contrib_x1e6) one row per observed cell. */
  def mutualInfoCells(df: DataFrame, xCol: String,
                      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("n_xy"))
    val nx = sum(col("n_xy")).over(Window.partitionBy(xCol))
    val ny = sum(col("n_xy")).over(Window.partitionBy(yCol))
    val n = sum(col("n_xy")).over()
    cells.withColumn("contrib_x1e6",
      floor(col("n_xy").cast("double") / n.cast("double") *
        log(col("n_xy").cast("double") * n.cast("double") /
          (nx.cast("double") * ny.cast("double"))) *
        lit(1e6)).cast("long"))
  }

  /** Exact Pearson correlation COMPONENTS between two integral
    * columns — the profiling statistic `corr()` computes in floats
    * (order-dependent, engine-flaky) expressed instead as exact
    * integer moment sums:
    *
    *   cov_num  = n·Σxy − Σx·Σy
    *   varx_num = n·Σx² − (Σx)²,  vary_num = n·Σy² − (Σy)²
    *   r² = cov_num² / (varx_num · vary_num)
    *
    * The sums fold in 64-bit and the cross-products in decimal(38,0)
    * (sum order is irrelevant for integers, so the result is
    * bit-identical on any partitioning/engine); only the final r²
    * ratio drops to one fixed-association double chain, floor-scaled
    * ×1e6, NULL when either variance is zero. Convert money to
    * cents/bands first — the integral contract is what buys the
    * exactness. One map-side-combined aggregate; one row out. */
  def corrExact(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val d = "decimal(38,0)"
    val agg = base.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("x")), lit(0L)).as("sx"),
      coalesce(sum(col("y")), lit(0L)).as("sy"),
      coalesce(sum((col("x") * col("y")).cast(d)), lit(0L).cast(d))
        .as("sxy"),
      coalesce(sum((col("x") * col("x")).cast(d)), lit(0L).cast(d))
        .as("sxx"),
      coalesce(sum((col("y") * col("y")).cast(d)), lit(0L).cast(d))
        .as("syy"))
    val cov = (col("n") * col("sxy") -
      col("sx").cast(d) * col("sy").cast(d)).cast(d)
    val varx = (col("n") * col("sxx") -
      col("sx").cast(d) * col("sx").cast(d)).cast(d)
    val vary = (col("n") * col("syy") -
      col("sy").cast(d) * col("sy").cast(d)).cast(d)
    agg.select(col("n"), col("sx"), col("sy"),
        cov.as("cov_num"), varx.as("varx_num"), vary.as("vary_num"))
      .withColumn("r2_x1e6",
        when(col("varx_num") === 0 || col("vary_num") === 0,
          lit(null).cast("long"))
          .otherwise(floor(
            col("cov_num").cast("double") * col("cov_num").cast("double")
              / (col("varx_num").cast("double") *
                col("vary_num").cast("double")) * lit(1e6)).cast("long")))
  }
}
