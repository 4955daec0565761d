package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: split each entity's event timeline into sessions at
  * inactivity gaps — the classic clickstream/log operator (and, in a
  * training-data pipeline, the conversation/episode segmentation step
  * before packing event streams into sequences).
  *
  * Gaps-and-islands, the [[Scd2]] shape: rows are ordered within an
  * entity by (`tsCol`, `seqCol`) — the sequence column breaks timestamp
  * ties deterministically — a lag-diff marks rows whose gap to the
  * previous event exceeds `gapNs`, and a running sum numbers the
  * sessions. ONE exchange by entity; both windows share it (same
  * partitioning and ordering), and the per-session aggregate is a
  * groupBy on the already-clustered (entity, session) keys. No state
  * beyond the window — at 100 TB this is a single shuffle of the event
  * relation however many sessions exist.
  */
object Sessionize {

  /** Per-event session assignment: input + `session` (1-based, dense per
    * entity in timeline order). `gapNs` is the inactivity threshold in
    * the units of `tsCol` (epoch nanoseconds for the events table): a
    * gap STRICTLY greater than `gapNs` starts a new session. */
  def assign(df: DataFrame, entityCol: String, tsCol: String,
             seqCol: String, gapNs: Long): DataFrame = {
    require(gapNs >= 0, s"negative gap $gapNs")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(seqCol))
    df.withColumn("__sz_prev", lag(col(tsCol), 1).over(w))
      .withColumn("__sz_start",
        when(col("__sz_prev").isNull ||
          col(tsCol) - col("__sz_prev") > gapNs, 1L).otherwise(0L))
      .withColumn("session", sum(col("__sz_start")).over(w))
      .drop("__sz_prev", "__sz_start")
  }

  /** Per-session summary: (entity, session, start_ts, end_ts, n_events,
    * duration = end − start). One extra map-side-combined groupBy over
    * [[assign]]'s output — the keys are clustered by the window's
    * exchange, so no second wide shuffle of the event payload. */
  def sessions(df: DataFrame, entityCol: String, tsCol: String,
               seqCol: String, gapNs: Long): DataFrame =
    assign(df, entityCol, tsCol, seqCol, gapNs)
      .groupBy(col(entityCol), col("session"))
      .agg(
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"))
      .withColumn("duration", col("end_ts") - col("start_ts"))
}
