package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The append/tombstone/compact discipline, factored out of the IVF+PQ
  * store so EVERY codec family shares one lifecycle implementation —
  * IVF+PQ/OPQ (cell-partitioned codes), SQ8 and BinaryQuant (flat code
  * tables), IVF+SQ8 (cell-partitioned byte codes). The reference leaves
  * update/delete unimplemented entirely (reference/README.md:73); here
  * the capability is uniform across families rather than an IVF+PQ-only
  * asymmetry.
  *
  * Mechanics, shared verbatim by all stores:
  *  - DELETE is append-only: dead ids land in a `tombstones` parquet
  *    beside the codes; every family's load anti-joins them out
  *    ([[liveView]]), so readers never see deleted vectors and nothing
  *    in the codes table is rewritten. Idempotent — re-deleting appends
  *    a duplicate tombstone row the anti-join ignores.
  *  - COMPACTION folds appends + tombstones back to the minimal layout
  *    with the crash-recoverable swap ([[swapInCodes]]): write-new →
  *    park-old → install-new → drop-old. No step deletes data that is
  *    not already installed elsewhere; a crash leaves the table at
  *    `codes`, `codes.old`, or the tmp dir — never nowhere. Run under
  *    the same maintenance lock as any table rewrite.
  *
  * Scale shape: the anti-join side is the tombstone log — small between
  * compactions by contract (compaction is exactly the maintenance step
  * that bounds it), so Spark broadcasts it; the compaction rewrite is
  * one shuffle (partitioned stores: on the cell id → one file per cell
  * dir; flat stores: to a caller-sized file count).
  */
object StoreLifecycle {

  /** Append-only DELETE: tombstone `ids` under `storePath/tombstones`.
    * Ids are stored as long — the id type every store family writes. */
  def deleteFromStore(storePath: String, ids: DataFrame,
                      idCol: String): Unit =
    ids.select(col(idCol).cast("long").as("id"))
      .write.mode(SaveMode.Append).parquet(s"$storePath/tombstones")

  /** The LIVE view of a store's code rows: `codes` minus tombstones
    * (left-anti on id) when the tombstone log exists, `codes` verbatim
    * otherwise. Every family's load path routes through here so the
    * delete semantics cannot drift between codecs. */
  def liveView(spark: SparkSession, storePath: String,
               codes: DataFrame): DataFrame = {
    val tPath = new org.apache.hadoop.fs.Path(s"$storePath/tombstones")
    val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tPath))
      codes.join(spark.read.parquet(s"$storePath/tombstones"),
        Seq("id"), "left_anti")
    else codes
  }

  /** True iff the store currently carries a tombstone log. */
  def hasTombstones(spark: SparkSession, storePath: String): Boolean = {
    val tPath = new org.apache.hadoop.fs.Path(s"$storePath/tombstones")
    tPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(tPath)
  }

  /** Crash-recoverable swap of a freshly-written codes table into place,
    * then drop the tombstone log: park-old → install-new → drop-old.
    * `tmp` must already hold the complete new table. */
  private[index] def swapInCodes(spark: SparkSession, storePath: String,
                                 tmp: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(p(s"$storePath/codes.old"), true)
    require(fs.rename(p(s"$storePath/codes"), p(s"$storePath/codes.old")),
      s"compaction swap failed: could not park $storePath/codes — " +
        "store unchanged")
    require(fs.rename(p(tmp), p(s"$storePath/codes")),
      s"compaction swap failed: could not install $tmp; the previous " +
        s"table is intact at $storePath/codes.old — rename it back to recover")
    fs.delete(p(s"$storePath/codes.old"), true)
    fs.delete(p(s"$storePath/tombstones"), true)
  }

  /** Compact a CELL-PARTITIONED store (IVF+PQ, OPQ, IVF+SQ8): rewrite
    * the live rows as ONE file per cell directory (one shuffle on the
    * cell id), swap, drop tombstones. A fully-tombstoned store compacts
    * to a zero-row UNPARTITIONED parquet (partitionBy of zero rows
    * writes no files and an empty dir cannot be read back; the root
    * placeholder keeps the schema readable — `partition` becomes a
    * regular empty column, which every consumer projects identically).
    * Returns the live per-cell histogram collected BEFORE the swap
    * (P′ rows — reading the new table after the swap would crash on a
    * zero-row store, and re-reading what was just written is wasted IO),
    * for callers that maintain a stats sidecar. */
  private[index] def compactPartitioned(spark: SparkSession,
                                        storePath: String,
                                        live: DataFrame)
      : Seq[(Int, Long)] = {
    val statRows = live.groupBy("partition").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val tmp = s"$storePath/codes.compacting"
    if (statRows.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], live.schema)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    else
      writeCellAligned(live, tmp, statRows.map(_._2))
    swapInCodes(spark, storePath, tmp)
    statRows
  }

  /** Cell-aligned codes write shared by the store savers and the
    * partitioned compaction: repartition on the cell id so each cell
    * directory holds ONE file (commit time + every later listing/open —
    * the round-14 layout win). A POPULOUS cell hash-routes to one task
    * (serial write + single-task memory pressure at base-build scale),
    * so when the caller's already-collected per-cell histogram shows a
    * cell past `rowsPerFile`, the rows are salted across
    * ceil(max-cell / rowsPerFile) writer tasks by a DETERMINISTIC id
    * hash (never rand() — retried map tasks must reproduce the routing)
    * and `maxRecordsPerFile` bounds any remaining over-target file.
    * Small-cell stores (every test store, and any store within the
    * rebalance contract) take the salts == 1 branch: the exact
    * one-file-per-cell plan and layout as before. */
  private[index] def writeCellAligned(df: DataFrame, dest: String,
      cellCounts: Seq[Long],
      rowsPerFile: Long = 4L * 1000 * 1000): Unit = {
    val maxCell = cellCounts.foldLeft(0L)(math.max)
    val salts = math.max(1L, (maxCell + rowsPerFile - 1) / rowsPerFile)
    val parted =
      if (salts == 1L) df.repartition(col("partition"))
      else df.repartition(col("partition"),
        pmod(xxhash64(col("id")), lit(salts)))
    parted.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy("partition").parquet(dest)
  }

  /** Compact a FLAT store (SQ8, BinaryQuant — no cell column): rewrite
    * the live rows into `max(1, ceil(liveCount / rowsPerFile))` files,
    * swap, drop tombstones. `rowsPerFile` sizes output files for the
    * deployment (default 4M rows ≈ 64-byte-codes × 4M = 256 MB before
    * encoding — parquet-friendly); a zero-row store compacts to one
    * schema-bearing empty file. Bit-exact by construction — rows ride
    * unchanged. Returns the live row count. */
  private[index] def compactFlat(spark: SparkSession, storePath: String,
                                 live: DataFrame,
                                 rowsPerFile: Long = 4L * 1000 * 1000)
      : Long = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    val cnt = live.count()
    val nFiles = math.max(1L, (cnt + rowsPerFile - 1) / rowsPerFile).toInt
    val tmp = s"$storePath/codes.compacting"
    live.repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInCodes(spark, storePath, tmp)
    cnt
  }
}
