package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: every left row paired with the right rows whose
  * time falls in [lTime + lo, lTime + hi] — "each click with the
  * purchases of the next five minutes". The naive plan is a cross join
  * with a theta filter (quadratic — a scale-killer the moment neither
  * side broadcasts); this operator runs it as an EQUI-join on a derived
  * time bucket:
  *
  *  - bucket width w = hi − lo; the right side keeps its single bucket
  *    ⌊rTime / w⌋;
  *  - a left row's window [lTime+lo, lTime+hi] spans at most two
  *    consecutive buckets, so the left side explodes to those (≤2,
  *    deduplicated) bucket keys;
  *  - the join is an equi-join on (bucket ++ extra keys), followed by
  *    the exact range predicate. Each qualifying pair meets exactly once
  *    (the right row owns exactly one bucket), so no post-distinct is
  *    needed — the same generate-once discipline as the LSH first-band
  *    trick in [[graft.pipeline.Dedup]].
  *
  * Scale shape: both shuffles are keyed by bucket (time-local), rows
  * carry only the projected columns, and skew maps to real temporal
  * hot-spots (add finer `extraKeys` or a salt column when one time
  * bucket dominates). This is the standard bucketed range-join that
  * engines with a native range-join optimization (e.g. interval joins in
  * stream processors) implement internally.
  */
object RangeJoin {

  /** Pairs (left ++ right) with rTime ∈ [lTime + lo, lTime + hi].
    * Column names must be disjoint across the two sides (project before
    * joining, as any join requires), except `extraKeys`, which must
    * exist on BOTH sides and appear twice in the raw output (select the
    * side you want). Time values and the shifted bounds are assumed
    * non-negative (epoch-based): Spark's `div` truncates toward zero, so
    * bucket ids are floor-division only on the non-negative range. */
  def bucketed(left: DataFrame, right: DataFrame,
               lTimeCol: String, rTimeCol: String,
               lo: Long, hi: Long,
               extraKeys: Seq[String] = Nil): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val w = hi - lo
    // floor-div on longs (expr `div`, not `/`: long÷long through double
    // loses exactness at e15 magnitudes — same trap as EventPipeline)
    val r = right.withColumn("__rb", expr(s"`$rTimeCol` div ${w}L"))
    val l = left
      .withColumn("__lb",
        explode(array_distinct(array(
          expr(s"(`$lTimeCol` + ${lo}L) div ${w}L"),
          expr(s"(`$lTimeCol` + ${hi}L) div ${w}L")))))
    val cond = (col("__lb") === col("__rb")) +:
      extraKeys.map(k => l(k) === r(k))
    l.join(r, cond.reduce(_ && _))
      .where(col(rTimeCol) >= col(lTimeCol) + lo &&
        col(rTimeCol) <= col(lTimeCol) + hi)
      .drop("__lb", "__rb")
  }
}
