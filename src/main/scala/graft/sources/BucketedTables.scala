package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed persistence — the storage layout for SHUFFLE-FREE equi-joins
  * and aggregations on a stable key at cluster scale.
  *
  * A table written with `bucketBy(n, key)` pre-hash-partitions its files
  * by the join key; two tables bucketed the same way join with NO
  * exchange on either side (and `sortBy` additionally removes the sort),
  * so a 100 TB fact⋈fact join that would otherwise shuffle both
  * relations every run pays the layout cost once at write time. This is
  * the Spark-native analogue of the reference keeping vectors grouped in
  * per-partition files (reference/src/db/build/proto.rs:59-62): the
  * storage layout carries the partitioning, queries inherit it.
  *
  * Use for relations that are joined/grouped on the same key repeatedly
  * — orders⋈lineitem on the order key, attribute logs on vector_id,
  * near-dup pair lists on doc_id. Bucket counts should be chosen once
  * per dataset scale (files per bucket stay ≥ 1 HDFS block) and MUST
  * match across tables meant to co-join.
  */
object BucketedTables {

  /** Persist `df` bucketed (and sorted) by `key` as a managed table.
    * Parquet under the session warehouse; metastore records the layout
    * so readers recover the partitioning without scanning. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Read a bucketed table back (the bucket layout rides along). */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
