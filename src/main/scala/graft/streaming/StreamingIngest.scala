package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.index.{IvfPqBuilder, IvfPqModel}

/** Continuous vector ingest: a STREAM of (id, vector) rows appended to a
  * stored IVF+PQ index against the frozen model — the standard
  * Structured Streaming `foreachBatch` sink around
  * [[IvfPqBuilder.appendToStore]] (encode + append are batch plans;
  * foreachBatch is Spark's idiom for driving a transactional batch
  * writer from a stream). Completes the index lifecycle story: build
  * (fit/save) → continuous ingest (this) → query (StreamingKnn) →
  * maintenance (delete/compact/rebalance).
  *
  * Delivery contract: AT-LEAST-ONCE from the source, narrowed to
  * exactly-once for Spark-level retries by a per-batch marker file under
  * `<path>/_ingest/` — foreachBatch re-delivers a micro-batch id on
  * recovery, and a marked id is skipped without touching the store. The
  * unprotected window is a crash BETWEEN the append finishing and the
  * marker write; recovery for that window is
  * [[IvfPqBuilder.deleteFromStore]] of the re-delivered batch's ids —
  * which the caller has in hand, since that batch is exactly the one
  * re-delivered. (The reference's content-addressed store shape would
  * close even that window; the parquet append model trades it for scan
  * speed — documented, not hidden.)
  *
  * Append-drift telemetry flows through unchanged: pass `log` and every
  * batch writes its cell histogram to the stats sidecar exactly like
  * batch appends do (see appendToStore's scaladoc).
  */
object StreamingIngest {

  /** Apply ONE micro-batch idempotently: append unless `batchId` already
    * has a marker, then mark. Returns whether the store was modified.
    * Public so tests (and batch backfills) drive the identical code path
    * the streaming sink drives. */
  def ingestBatch(model: IvfPqModel, batch: DataFrame, idCol: String,
                  vecCol: String, path: String, batchId: Long,
                  log: String => Unit = _ => ()): Boolean = {
    val fs = new Path(path).getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$path/_ingest/batch-$batchId")
    if (fs.exists(marker)) {
      log(s"ingest: batch $batchId already applied — skipping replay")
      false
    } else {
      IvfPqBuilder.appendToStore(model, batch, idCol, vecCol, path, log)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      true
    }
  }

  /** Start the continuous ingest query over a streaming (idCol, vecCol)
    * relation. Empty micro-batches are skipped without marking. */
  def ingest(stream: DataFrame, model: IvfPqModel, idCol: String,
             vecCol: String, path: String, checkpoint: String,
             log: String => Unit = _ => ()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          ingestBatch(model, batch, idCol, vecCol, path, batchId, log)
        }
        ()
      }
      .start()
}
