package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — aligning an irregular
  * event stream onto fixed ticks, the feature-store / time-series-
  * alignment prep every training pipeline over temporal data runs
  * (the batch analogue of a streaming sliding-window state read).
  *
  * Per key, ticks cover the key's OWN observed span, aligned to the
  * step: from ⌈min/step⌉·step to ⌊max/step⌋·step — every emitted tick
  * therefore has at least one observation at or before it, so the fill
  * never fabricates a value before the first event (no leading nulls
  * by construction; keys whose span straddles no aligned tick emit
  * nothing).
  *
  * Shape: ONE keyed aggregate computes the spans (key-cardinality
  * relation), ticks explode from an in-plan `sequence` (never a
  * cross-join against a calendar table), and the fill itself is
  * [[AsofJoin.backward]] — union + one keyed window, no range
  * cross-join. Two keyed exchanges total, independent of the tick
  * density. Time columns are non-negative epoch longs (ns in the
  * events table); `stepUnits` is in the same units. */
object Resample {

  /** The per-key aligned tick grid (keys…, grid_ts). */
  private def gridOf(events: DataFrame, keys: Seq[String], tsCol: String,
                     stepUnits: Long): DataFrame = {
    require(stepUnits > 0, s"step must be positive, got $stepUnits")
    val spans = events.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx"))
    val startC = expr(s"((__mn + ${stepUnits - 1}L) div ${stepUnits}L) " +
      s"* ${stepUnits}L")
    val endC = expr(s"(__mx div ${stepUnits}L) * ${stepUnits}L")
    spans.where(startC <= endC)
      .select(keys.map(col) :+
        explode(sequence(startC, endC, lit(stepUnits))).as("grid_ts"): _*)
  }

  /** (keys…, grid_ts, value = latest `valueCol` at or before the tick,
    * src_ts = that observation's time). `seqCol` breaks exact-time ties
    * (largest wins, the as-of contract). */
  def forwardFill(events: DataFrame, keys: Seq[String], tsCol: String,
                  seqCol: String, valueCol: String,
                  stepUnits: Long): DataFrame =
    AsofJoin.backward(gridOf(events, keys, tsCol, stepUnits),
        events.select(keys.map(col) ++
          Seq(col(tsCol), col(seqCol), col(valueCol)): _*),
        keys, "grid_ts", tsCol, payload = Seq(valueCol),
        leftSeq = "grid_ts", rightSeq = seqCol)
      .select(keys.map(col) ++ Seq(col("grid_ts"),
        col(s"asof_$valueCol").as("value"),
        col("asof_time").as("src_ts")): _*)

  /** Linear interpolation at each tick between the surrounding
    * observations — both always exist (ticks live inside the key's
    * span by construction); a tick ON an observation, or an exact-time
    * tie, takes the backward value. The lerp expression tree is written
    * once and mirrored verbatim by the oracle, so the IEEE result is
    * bit-identical across engines. Two as-of passes over the same
    * grid (backward then forward) — still keyed-exchange-bounded. */
  def interpolate(events: DataFrame, keys: Seq[String], tsCol: String,
                  seqCol: String, valueCol: String,
                  stepUnits: Long): DataFrame = {
    val ev = events.select(keys.map(col) ++
      Seq(col(tsCol), col(seqCol), col(valueCol)): _*)
    val back = AsofJoin.backward(gridOf(events, keys, tsCol, stepUnits),
        ev, keys, "grid_ts", tsCol, payload = Seq(valueCol),
        leftSeq = "grid_ts", rightSeq = seqCol)
      .withColumnRenamed("asof_time", "t0")
      .withColumnRenamed(s"asof_$valueCol", "v0")
    val both = AsofJoin.forward(back, ev, keys, "grid_ts", tsCol,
        payload = Seq(valueCol), leftSeq = "grid_ts", rightSeq = seqCol)
      .withColumnRenamed("asof_time", "t1")
      .withColumnRenamed(s"asof_$valueCol", "v1")
    both.select(keys.map(col) ++ Seq(col("grid_ts"),
      when(col("t1").isNull || col("t1") === col("t0"), col("v0"))
        .otherwise(col("v0") + (col("v1") - col("v0")) *
          ((col("grid_ts") - col("t0")).cast("double") /
            (col("t1") - col("t0")).cast("double")))
        .as("value"),
      col("t0"), col("t1")): _*)
  }
}
