package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Streaming incremental record linkage: a STREAM of new records checked
  * against a static master table — the continuous form of
  * [[graft.pipeline.Dedup.editDistancePairsBipartite]] (whose batch
  * output is the oracle-gated semantics; StreamingLinkageSpec asserts the
  * streaming path emits the identical pair relation trigger by trigger).
  *
  * Three prepared STATIC relations, all persistable (the 100 TB ingest
  * shape — daily/streaming batches link without re-gramming history):
  *  - [[masterGrams]] (master_id, pos, g, bk): the positional q-gram
  *    relation, the candidate-join side;
  *  - [[masterGramFreq]] (g, bk, df): gram frequencies, which rank the
  *    NEW side's rare-gram signatures (rarity is measured against the
  *    master, since master is what the signature probes);
  *  - [[masterStrings]] (master_id, s): for exact Levenshtein verify.
  *
  * Unlike [[StreamingDedup]]'s stateless stream-static joins, the
  * signature selection here needs a per-record window (the k·q+1 RAREST
  * grams of each new record), which Structured Streaming does not run on
  * an unbounded stream — so the wrap is `foreachBatch`: every trigger is
  * a bounded batch, [[linkPairs]] runs the exact batch operator against
  * the prepared master relations, and the per-trigger output is the
  * batch-identical link set for that batch's records. State lives in the
  * persisted master relations, not in the stream.
  */
object StreamingLinkage {

  /** Static master gram relation (master_id, pos, g, bk). The same
    * in-pass soundness-floor guard as the batch operator rides the gram
    * projection (validate = false to skip). */
  def masterGrams(masterDf: DataFrame, idCol: String, strCol: String,
                  maxDist: Int, q: Int = 3,
                  validate: Boolean = true): DataFrame =
    Dedup.linkageGramsOf(
      checkedBase(masterDf, idCol, strCol, maxDist, q, validate), maxDist, q)
      .withColumnRenamed("id", "master_id")

  /** Static master gram frequencies (g, bk, df). */
  def masterGramFreq(masterGrams: DataFrame): DataFrame =
    masterGrams.groupBy("g", "bk").agg(count(lit(1)).as("df"))

  /** Static master verification relation (master_id, s). */
  def masterStrings(masterDf: DataFrame, idCol: String,
                    strCol: String): DataFrame =
    base(masterDf, idCol, strCol).withColumnRenamed("id", "master_id")

  private def base(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"))

  private def checkedBase(df: DataFrame, idCol: String, strCol: String,
                          maxDist: Int, q: Int,
                          validate: Boolean): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      Dedup.checkedStr(col(strCol), q, maxDist, validate).as("s"))

  /** Link ONE bounded batch of new records (idCol, strCol) against the
    * prepared master relations — the per-trigger body, identical to the
    * batch operator's output for that batch. Output:
    * (new_id, master_id, dist). */
  def linkPairs(newBatch: DataFrame, idCol: String, strCol: String,
                masterGrams: DataFrame, masterGramFreq: DataFrame,
                masterStrings: DataFrame, maxDist: Int,
                q: Int = 3, validate: Boolean = true): DataFrame =
    Dedup.editDistancePairsAgainst(
      checkedBase(newBatch, idCol, strCol, maxDist, q, validate),
      masterGrams.withColumnRenamed("master_id", "id"),
      masterGramFreq,
      masterStrings.withColumnRenamed("master_id", "id"),
      maxDist, q)

  /** The continuous query: every micro-batch of `stream` (idCol, strCol)
    * is linked against the master relations and handed to `sink` as
    * (new_id, master_id, dist) — append semantics, each new record's
    * links emitted in the trigger that carried it.
    *
    * foreachBatch is AT-LEAST-ONCE under recovery: a failed trigger
    * replays with the same batchId, so a non-idempotent sink must key
    * on (batchId, new_id, master_id) — the same contract
    * [[StreamingIngest]] documents with its per-batch markers. */
  def linkStream(stream: DataFrame, idCol: String, strCol: String,
                 masterGrams: DataFrame, masterGramFreq: DataFrame,
                 masterStrings: DataFrame, maxDist: Int, q: Int,
                 checkpointDir: String)
                (sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(linkPairs(batch, idCol, strCol, masterGrams,
          masterGramFreq, masterStrings, maxDist, q), batchId)
      }
      .start()
}
