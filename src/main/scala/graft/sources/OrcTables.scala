package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC as a second columnar interchange format beside parquet — the
  * hand-off surface for warehouses that standardize on ORC (Hive
  * lineage). Same storage contract the parquet layouts get
  * ([[PartitionedTables]]): hive-style partition directories so a
  * partition predicate prunes directories before any file is opened,
  * and ORC's min/max stripe statistics serve row-group skipping for
  * pushed data predicates — `OrcTablesSpec` plan-audits both
  * (PartitionFilters + PushedFilters reaching the scan). Columnar
  * projection works as in parquet: a 2-column read materializes 2
  * columns, which is the property that matters at 100 TB. */
object OrcTables {

  /** Write `df` as an ORC table partitioned by `partitionCol`
    * (hive-style directories, one per distinct value). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).orc(path)

  /** Read an ORC table (partition columns reconstructed from the
    * directory layout). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
