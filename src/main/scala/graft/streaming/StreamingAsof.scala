package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.lastLeIdx

/** Stream-static as-of join: enrich each (possibly streaming) fact row
  * with the latest state of a STATIC dimension timeline at or before the
  * row's own time — price history, model-version history, config
  * changelogs; the dimension-enrichment case of the as-of family.
  *
  * The batch-batch general case is [[graft.operators.AsofJoin]] (one
  * keyed exchange + carry-forward window); that shape needs the whole
  * timeline per key in one sorted partition and is not expressible
  * incrementally. Here the dimension is static and key-timeline-small by
  * nature, so it collapses ONCE into per-key parallel sorted arrays
  * (times, payloads), rides to every task in a broadcast hash join, and
  * each fact row picks its match with an O(log m) binary-search kernel —
  * no stream shuffle, no watermark state, works identically under
  * `readStream` (plain projections + a broadcast join are fully
  * stream-compatible) and in batch.
  */
object StreamingAsof {

  /** For every row of `facts`, the dimension payload as of
    * `facts.timeCol` (backward, ties included). Adds `asof_time` (the
    * matched dimension time, null when nothing precedes) and
    * `asof_<payloadCol>`. Time columns are numeric (e.g. epoch ns/µs).
    *
    * @param dim static (key, time, payload) — each key's timeline must
    *            be modest (it is collapsed to one array row); the
    *            collapsed relation is broadcast. Keep (key, time) unique
    *            upstream: duplicate times resolve to the largest payload
    *            under struct ordering, not a caller-chosen seq.
    */
  def backwardStatic(facts: DataFrame, keyCol: String, timeCol: String,
                     dim: DataFrame, dimKeyCol: String, dimTimeCol: String,
                     payloadCol: String): DataFrame = {
    val out = s"asof_$payloadCol"
    require(!facts.columns.contains(out) && !facts.columns.contains("asof_time"),
      s"facts must not already carry $out/asof_time")
    val timeline = dim
      .groupBy(col(dimKeyCol).as("__k"))
      .agg(array_sort(collect_list(struct(
        col(dimTimeCol).cast("long").as("t"), col(payloadCol).as("p"))))
        .as("__tl"))
      .select(col("__k"),
        transform(col("__tl"), s => s.getField("t")).as("__times"),
        transform(col("__tl"), s => s.getField("p")).as("__vals"))
    val idx: Column = lastLeIdx(col("__times"), col(timeCol).cast("long"))
    facts
      .join(broadcast(timeline), facts(keyCol) === col("__k"), "left")
      .withColumn("__i", idx)
      .withColumn("asof_time",
        when(col("__i") >= 0, element_at(col("__times"), col("__i") + 1)))
      .withColumn(out,
        when(col("__i") >= 0, element_at(col("__vals"), col("__i") + 1)))
      .drop("__k", "__times", "__vals", "__i")
  }
}
