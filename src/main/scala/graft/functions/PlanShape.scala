package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
    * session default and plans stay unchanged at test scale.
    *
    * The split count comes from the LOGICAL plan's leaves, not from the
    * planned output partitioning: file relations contribute
    * ⌈bytes / maxPartitionBytes⌉ (what the scan would split into), and
    * materialized RDD scans (localCheckpoint outputs) contribute their
    * actual block count. That keeps the width tracking INPUT volume
    * even when `df` is a derived relation whose final partitioning is
    * already the session shuffle default (a post-aggregate or
    * post-checkpoint plan), and it never forces physical planning.
    * Known caveat: a localCheckpoint taken at session-default width
    * reports that width here — callers data-size the exchange BEFORE
    * checkpointing corpus-sized relations. Unrecognized leaves (cached
    * relations, v2 sources) fall back to the planned RDD width. */
  def dataSizedParts(df: DataFrame): Int = {
    val conf = df.sparkSession.sessionState.conf
    val splitBytes = math.max(1L, conf.filesMaxPartitionBytes)
    var splits = 0L
    var unknown = false
    df.queryExecution.optimizedPlan.collectLeaves().foreach {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          splits += math.max(1L,
            (fs.location.sizeInBytes + splitBytes - 1) / splitBytes)
        case _ => unknown = true
      }
      case rdd: LogicalRDD => splits += math.max(1, rdd.rdd.getNumPartitions)
      case _: LocalRelation => splits += 1
      case _ => unknown = true
    }
    val inputSplits =
      if (unknown || splits == 0L)
        df.queryExecution.toRdd.getNumPartitions.toLong
      else splits
    math.max(conf.numShufflePartitions,
      math.min(inputSplits * 4, Int.MaxValue.toLong).toInt)
  }

  /** Scan-parallelism FLOOR for per-row-HEAVY projections (media
    * decode/encode, n-gram fingerprint explodes, signature hashing,
    * edit-distance blocks): a small input file arrives as ONE scan
    * split, so everything before the first exchange runs in one task —
    * the round-14 job profile caught single 4-5 s one-task stages on a
    * 32-core box (and `spark.sql.files.minPartitionNum` cannot split a
    * single-row-group parquet). When the plan's partitioning is below
    * the cluster's default parallelism, round-robin repartition up to
    * it; at data scale inputs carry many splits and this is the
    * IDENTITY (no added exchange), so the fan-out only ever pays its
    * small shuffle where the alternative is serializing the stage.
    * Row order changes (round-robin), never row content — callers are
    * per-row pure projections. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
