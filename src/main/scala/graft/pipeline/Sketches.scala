package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
}
