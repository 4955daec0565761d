package graft.functions

import org.apache.spark.sql.DataFrame

/** Plan-shaping helpers shared by the pipeline operators. */
object PlanShape {

  /** Data-sized exchange width for CORPUS-SIZED relations feeding a
    * join, window, or mostly-singleton aggregate: `max(session
    * default, 4 reducers per input split)`. Hashed into the session's
    * default reducer count, each task of a corpus-sized exchange holds
    * input/P rows — sort buffers and aggregation hash maps spill long
    * before the default is wrong for ordinary relations (measured at
    * 10M docs: the duplicated-window aggregate 106 → 40 s; at 100M
    * events: the per-user path window 102 → 37 s). Four per split
    * tracks the DATA volume — a 100 TB input with ~1e5 splits gets
    * ~4e5 reducers regardless of the session default, exactly as a
    * cluster-sized job would be tuned, while small inputs keep the
    * session default and plans stay unchanged at test scale. */
  def dataSizedParts(df: DataFrame): Int = math.max(
    df.sparkSession.sessionState.conf.numShufflePartitions,
    df.queryExecution.toRdd.getNumPartitions * 4)
}
