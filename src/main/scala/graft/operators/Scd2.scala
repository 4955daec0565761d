package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: turn a change LOG (entity, time,
  * state) into a HISTORY of validity intervals — one row per contiguous
  * run of the same state, with `valid_from`/`valid_to` bounds and a
  * current-row flag. The standard warehouse shape for "what was this
  * user's state at time t" point-in-time joins (which then compose with
  * [[AsofJoin]]).
  *
  * Classic gaps-and-islands: a segment starts wherever the state
  * differs from the previous row's state; the segment id is the running
  * count of starts; min/max/count per (entity, segment) gives the
  * interval. Two windows and one aggregate, ALL partitioned by the
  * entity key — a single shuffle of the log by entity at any scale, no
  * driver state. Consecutive duplicate states collapse, so the output
  * is bounded by the number of CHANGES, not the number of events.
  */
object Scd2 {

  final case class ChangeEvent(user_id: Long, ts: Long, event_id: Long,
                               state: String)
  /** Per-entity stream state: the open interval PLUS the last-seen
    * (ts, event_id), which is how [[closedHistoryStream]] detects a
    * violated arrival-order contract instead of silently corrupting
    * history. */
  final case class OpenInterval(state: String, valid_from: Long,
                                n_events: Long, last_ts: Long,
                                last_eid: Long)
  final case class ClosedInterval(user_id: Long, state: String,
                                  valid_from: Long, valid_to: Long,
                                  n_events: Long)

  /** STREAMING twin of [[history]]: closed validity intervals emitted
    * incrementally as state changes arrive, the open interval held in
    * `flatMapGroupsWithState` keyed by entity (one small state record
    * per entity, not per event). Append-mode output — an interval is
    * emitted exactly once, when the event that closes it arrives; the
    * batch operator's `is_current` rows are precisely the ones still
    * open in state. Requires per-entity event-time order ACROSS
    * micro-batches (the CDC-source contract); within a batch events are
    * sorted by (ts, seq). The contract is ENFORCED, not assumed: state
    * carries the last-seen (ts, event_id), and an arrival ordered
    * before it fails the query loudly (IllegalStateException naming the
    * entity and both positions) — silently mis-ordered history is the
    * one thing a validity-interval table must never produce. Works
    * identically in batch mode (state starts empty), which is what the
    * spec's streaming ≡ batch gate uses. */
  def closedHistoryStream(events: org.apache.spark.sql.Dataset[ChangeEvent])
      : org.apache.spark.sql.Dataset[ClosedInterval] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenInterval, ClosedInterval](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, gs) =>
          val batch = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var open = gs.getOption
          val out = Seq.newBuilder[ClosedInterval]
          batch.foreach { e =>
            open.foreach { o =>
              if (e.ts < o.last_ts ||
                  (e.ts == o.last_ts && e.event_id < o.last_eid))
                throw new IllegalStateException(
                  s"closedHistoryStream: out-of-order arrival for entity " +
                    s"$uid — event (ts=${e.ts}, id=${e.event_id}) after " +
                    s"(ts=${o.last_ts}, id=${o.last_eid}); the CDC source " +
                    s"must deliver each entity's events in (ts, id) order " +
                    s"across micro-batches")
            }
            open match {
              case Some(o) if o.state == e.state =>
                open = Some(o.copy(n_events = o.n_events + 1,
                  last_ts = e.ts, last_eid = e.event_id))
              case Some(o) =>
                out += ClosedInterval(uid, o.state, o.valid_from, e.ts,
                  o.n_events)
                open = Some(OpenInterval(e.state, e.ts, 1L, e.ts, e.event_id))
              case None =>
                open = Some(OpenInterval(e.state, e.ts, 1L, e.ts, e.event_id))
            }
          }
          open.foreach(gs.update)
          out.result().iterator
      }
  }

  /** Validity intervals per entity. Rows are ordered within an entity by
    * (`tsCol`, `seqCol`) — the sequence column breaks timestamp ties
    * deterministically. Output: (entity, state, valid_from, valid_to,
    * n_events, is_current), where `valid_to` is the NEXT interval's
    * start (half-open [from, to)) and -1 on the current row, and
    * `n_events` counts the log rows the interval collapsed.
    *
    * CONTRACT: `tsCol` must be non-negative — -1 is the open-interval
    * sentinel, so a log that can legally contain negative timestamps
    * (pre-1970 epoch values, say) would make a real `valid_to = -1`
    * indistinguishable from "still open" to consumers that key on the
    * sentinel rather than `is_current`. `is_current` is always the
    * authoritative open-row flag; the sentinel is kept (rather than a
    * NULL `valid_to`) so the output stays join-friendly for range
    * predicates without null-handling. Timestamps here are epoch
    * nanoseconds in practice (the driver's event fixtures), which are
    * non-negative by construction.
    *
    * ONE exchange: segments are contiguous in the per-entity timeline,
    * so instead of the textbook running-sum-segment-id + groupBy
    * (a second hash exchange on (entity, segment)), only the segment
    * START rows are kept and `lead` over the SAME entity partitioning
    * supplies the closing timestamp and the collapsed-row count
    * (difference of overall row numbers). The filter between the two
    * window passes preserves partitioning and (ts, seq) order, so
    * Catalyst plans a single hashpartitioning(entity) exchange and a
    * single sort for the whole operator. */
  def history(log: DataFrame, entityCol: String, tsCol: String,
              seqCol: String, stateCol: String): DataFrame = {
    val byRow = Window.partitionBy(entityCol).orderBy(col(tsCol), col(seqCol))
    val whole = Window.partitionBy(entityCol)
    log
      .withColumn("rn", row_number().over(byRow).cast("long"))
      .withColumn("prev_state", lag(col(stateCol), 1).over(byRow))
      .withColumn("n_rows", count(lit(1)).over(whole))
      .where(col("prev_state").isNull ||
        col("prev_state") =!= col(stateCol)) // segment start rows only
      .withColumn("valid_to",
        coalesce(lead(col(tsCol), 1).over(byRow), lit(-1L)))
      .withColumn("n_events",
        coalesce(lead(col("rn"), 1).over(byRow), col("n_rows") + 1L)
          - col("rn"))
      .withColumn("is_current",
        when(col("valid_to") === -1L, 1L).otherwise(0L))
      .select(col(entityCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col("valid_to"), col("n_events"),
        col("is_current"))
  }
}
