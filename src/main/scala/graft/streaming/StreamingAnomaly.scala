package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest-volume anomaly monitor: the continuous form of
  * [[EventPipeline.dailyAnomalies]] — watch an event stream's
  * per-(type, day) volume against its own trailing baseline and read
  * the flags after any trigger.
  *
  * Decomposition mirrors [[StreamingDrift]], so the streaming result
  * is batch-identical (StreamingAnomalySpec asserts it trigger by
  * trigger): each micro-batch contributes a (event_type, day, day_cnt)
  * histogram that merges ADDITIVELY into the accumulated state
  * (counts of disjoint row sets sum — no window arithmetic happens
  * until read time), and [[flags]] applies the same integer z-score
  * rule the batch operator uses over the accumulated relation.
  *
  * At 100 TB the state is #types × #days rows — metadata-sized however
  * much stream has passed; each trigger pays one map-side-combined
  * aggregate over its own batch only. */
object StreamingAnomaly {

  /** (event_type, day, day_cnt) histogram of one (micro)batch. */
  def dayCounts(batch: DataFrame, tsCol: String,
                typeCol: String): DataFrame =
    EventPipeline.dailyCounts(batch, tsCol, typeCol)

  /** Additive merge of two day-count histograms — the foreachBatch
    * fold (same rows arriving across triggers sum exactly). */
  def mergeDayCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("event_type", "day")
      .agg(sum(col("day_cnt")).as("day_cnt"))

  /** Anomaly flags over the accumulated state — identical columns and
    * decisions to [[EventPipeline.dailyAnomalies]] on the same data. */
  def flags(accumulated: DataFrame, baseDays: Int = 7, minBase: Int = 5,
            z: Int = 3): DataFrame =
    EventPipeline.anomalyFlags(accumulated, baseDays, minBase, z)
}
