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
}
