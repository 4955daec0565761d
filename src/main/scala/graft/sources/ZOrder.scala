package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-column DATA LAYOUT for
  * min/max pruning, completing the layout family: [[PartitionedTables]]
  * prunes directories on ONE partition column, [[BucketedTables]] prunes
  * shuffles on the join key; Z-ordering makes parquet's free row-group
  * zone maps (min/max statistics) selective on TWO filter columns at
  * once.
  *
  * Why a single-column sort is not enough at 100 TB: sorting events by
  * `user_id` gives every file a tight user range but a RANDOM value
  * range, so `WHERE value BETWEEN …` still reads every file. Interleaving
  * the bits of both keys (the Morton curve; the Z-ORDER of Delta and
  * Iceberg) bounds each file in BOTH dimensions — a box predicate on
  * either or both columns skips most row groups, and the skipping comes
  * from statistics parquet already writes, with zero read-side cost.
  *
  * The code is pure integer shift/mask arithmetic composed per bit —
  * whole-stage-codegen friendly and exactly replicable in ANSI SQL, so
  * the layout key itself is oracle-checkable bit for bit.
  */
object ZOrder {

  /** 2-D Morton code: interleave the low `bits` bits of `a` (even
    * positions) and `b` (odd positions). Inputs are clamped to
    * [0, 2^bits) — out-of-range keys saturate rather than alias to a far
    * corner of the curve. Non-overlapping powers of two, so the per-bit
    * terms combine by plain addition (exact in any engine's BIGINT). */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val top = (1L << bits) - 1
    def clamp(c: Column) =
      least(greatest(c.cast("long"), lit(0L)), lit(top))
    val ca = clamp(a)
    val cb = clamp(b)
    (0 until bits).map { i =>
      shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The matching ANSI-SQL expression for [[zValue2]] (DuckDB/any engine;
    * floor-division and modulo on BIGINT), for oracle replication. */
  def zValue2Sql(a: String, b: String, bits: Int = 16): String = {
    val top = (1L << bits) - 1
    val ca = s"least(greatest(CAST($a AS BIGINT), 0), $top)"
    val cb = s"least(greatest(CAST($b AS BIGINT), 0), $top)"
    (0 until bits).map { i =>
      s"(($ca // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"(($cb // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
  }

  /** Persist `df` clustered on the Morton code of (`aCol`, `bCol`):
    * range-partition into `numFiles` files by z-value and sort within
    * each, so every file covers a tight z-range — and therefore a tight
    * box in (a, b) — in parquet's row-group min/max stats. One shuffle
    * (the range exchange); the sort is per-partition, never global. */
  def writeZOrdered(df: DataFrame, path: String, aCol: String, bCol: String,
                    numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("zv", zValue2(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
