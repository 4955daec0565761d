package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for a training-data pipeline: deterministic
  * splits, per-group subsampling, and sequence packing. All three are
  * pure narrow-or-windowed plans with engine-portable integer/string
  * semantics, so each driver entry has an exact DuckDB oracle.
  */
object TrainingData {

  /** First two lowercase-hex chars of md5 of the row id rendered as a
    * string — a stable 256-bucket key identical across engines (byte-wise
    * string comparison, no hex→int parsing needed). */
  private def hashBucket(idCol: String): Column =
    substring(md5(col(idCol).cast("string").cast("binary")), 1, 2)

  /** Deterministic train/val/test assignment by hashing the ROW ID — the
    * split a 100 TB pipeline needs: membership is a pure function of the
    * id (no global sample, no state), so it is stable under reruns,
    * repartitions, and incremental appends, and never shuffles: one narrow
    * projection. Thresholds are on the 256-bucket md5 prefix:
    * 00..cb → train (≈79.7%), cc..e5 → val (≈10.2%), e6..ff → test. */
  def hashSplit(df: DataFrame, idCol: String,
                trainHi: String = "cc", valHi: String = "e6"): DataFrame = {
    val b = hashBucket(idCol)
    df.withColumn("split",
      when(b < trainHi, "train").when(b < valHi, "val").otherwise("test"))
  }

  /** At most `cap` rows per group, chosen by deterministic pseudo-random
    * order (md5 of the id) — per-domain/per-source balancing ("keep ≤N
    * docs per domain"). One shuffle on the group key; the per-group sort
    * is bounded by the group size. Groups far larger than a partition
    * should pre-thin with [[hashSplit]]-style bucket filters first —
    * documented trade-off, same as any per-group top-k. */
  def perGroupCap(df: DataFrame, groupCol: String, idCol: String,
                  cap: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= cap)
      .drop("rnk")
  }

  /** GPT-style sequence packing by concat-then-chunk: documents are laid
    * out in deterministic id order within `shards` independent shards,
    * token counts accumulate, and a document's training sequence is its
    * START OFFSET divided by the token budget (documents straddling a
    * boundary continue into the next sequence — the standard pretraining
    * packing, not bin packing). Output per doc:
    * (id, shard, seq_id, seq_offset) with seq_offset ∈ [0, budget).
    *
    * Scale shape: one shuffle on the shard key, then a per-shard
    * running sum — shard count sets the parallelism (a 1000-executor run
    * uses thousands of shards; each shard's scan is linear and
    * shuffle-free). The global-order variant (shards=1) exists only for
    * tests. */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: Column,
                    budget: Int, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", tokenCol.cast("long"))
      .withColumn("shard", pmod(col(idCol), lit(shards)).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol),
        col("shard"),
        floor((col("cum") - col("n_tokens")) / budget).cast("long").as("seq_id"),
        ((col("cum") - col("n_tokens")) % budget).cast("long").as("seq_offset"))
  }
}
