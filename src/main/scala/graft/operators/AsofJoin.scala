package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event) join — the classic time-series operator Spark
  * has no native node for. For every left row, attach the payload of the
  * latest right row with `right.time <= left.time` (backward) or the
  * earliest with `right.time >= left.time` (forward), matching on
  * equi-keys, ties at equal time INCLUDED (the `>=`/`<=` convention of
  * DuckDB/pandas ASOF).
  *
  * Spark-first plan, not a range join: both sides are unioned into one
  * relation tagged by side, hash-exchanged ONCE on the equi-keys, sorted
  * within partitions by (time, side, seq), and the right payload is
  * carried onto left rows with `last(..., ignoreNulls)` over a running
  * window. Cost = one shuffle of each input + an in-partition sort —
  * the same class as a shuffle join, with none of the row explosion an
  * interval/theta join suffers (a naive `l.time >= r.time` join is
  * O(|L|·|R|) per key and dies at 100 TB; this stays O(n log n) per
  * partition). Skewed keys shard like any hash exchange; a key's whole
  * timeline lands in one partition, which is the operator's inherent
  * ordering requirement (same as any window over (key, time)).
  *
  * Determinism: `seq` break ties among equal times within a side; among
  * right rows at identical (keys, time, seq) the relation is expected
  * unique (enforce upstream if the source can violate it).
  */
object AsofJoin {

  /** Backward as-of: latest right row with right.time <= left.time.
    *
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTime  left ordering column (numeric or timestamp)
    * @param rightTime right ordering column (same type as leftTime)
    * @param payload   right columns to attach, emitted as `asof_<name>`;
    *                  `asof_time` (the matched right time) always rides
    *                  along
    * @param leftSeq   unique left tie-break column (e.g. an event id)
    * @param rightSeq  unique right tie-break column
    * @param tolerance max allowed left.time − right.time (same units as
    *                  the time columns, numeric columns only); matches
    *                  staler than this are nulled, left rows kept
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, payload: Seq[String],
               leftSeq: String, rightSeq: String,
               tolerance: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, payload, leftSeq, rightSeq,
      tolerance, forward = false)

  /** Forward as-of: earliest right row with right.time >= left.time. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String, payload: Seq[String],
              leftSeq: String, rightSeq: String,
              tolerance: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, payload, leftSeq, rightSeq,
      tolerance, forward = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String, payload: Seq[String],
                   leftSeq: String, rightSeq: String, tolerance: Option[Long],
                   forward: Boolean): DataFrame = {
    val pcols = payload.map(p => s"asof_$p")
    require(!left.columns.exists(c => pcols.contains(c) || c == "asof_time"),
      s"left side must not already carry ${pcols.mkString(", ")} or asof_time")
    // side tag orders right rows so a right row at EXACTLY left.time is
    // visible to the window: before left rows for backward (running
    // window ends at current), after left rows for forward
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
      .withColumn("__seq", col(leftSeq))
    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(rightSide).as("__side"),
          col(rightSeq).as("__seq"), col(rightTime).as("asof_time")) ++
        payload.zip(pcols).map { case (p, a) => col(p).as(a) }: _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val ord = Seq(col("__t"), col("__side"), col("__seq"))
    val w = Window.partitionBy(keys.map(col): _*)
    val (frame, pick) =
      if (forward)
        (w.orderBy(ord: _*).rowsBetween(Window.currentRow, Window.unboundedFollowing),
          (c: Column) => first(c, ignoreNulls = true))
      else
        (w.orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow),
          (c: Column) => last(c, ignoreNulls = true))
    val carried = ("asof_time" +: pcols).foldLeft(u) { (acc, c) =>
      acc.withColumn(c, pick(col(c)).over(frame))
    }
    val matched = carried.where(col("__side") === leftSide)
    val bounded = tolerance.fold(matched) { tol =>
      val fresh =
        if (forward) col("asof_time") - col("__t") <= tol
        else col("__t") - col("asof_time") <= tol
      ("asof_time" +: pcols).foldLeft(matched) { (acc, c) =>
        acc.withColumn(c, when(fresh, col(c)))
      }
    }
    bounded.drop("__t", "__side", "__seq")
  }
}
