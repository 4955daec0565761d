package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.DataFrame

import graft.pipeline.Dedup

/** Streaming ingest-time verbatim-overlap detection: a STREAM of new
  * documents checked against a static corpus — the continuous form of
  * [[graft.pipeline.Dedup.winnowedPairsBipartite]] (whose batch output
  * is the oracle-gated semantics; StreamingWinnowSpec asserts the
  * streaming path emits the identical pair relation trigger by
  * trigger).
  *
  * Two prepared STATIC relations, both pure projections of the corpus
  * and persistable (the 100 TB ingest shape — the standing corpus is
  * fingerprinted ONCE, then every arriving batch joins against it):
  *  - [[Dedup.winnowedCorpusFingerprints]] (corpus_id, fp), maxDf
  *    boilerplate cap applied;
  *  - [[Dedup.winnowedCorpusWindows]] (corpus_id, ls) for the exact
  *    shared-L-window verification.
  *
  * Like [[StreamingLinkage]], the per-batch operator needs bounded
  * relations (the winnowing selection and the sorted-merge verify are
  * per-row kernels, but the candidate join + distinct is a batch
  * aggregation), so the wrap is `foreachBatch`: every trigger runs the
  * exact batch operator against the prepared corpus relations. State
  * lives in the persisted corpus relations, not in the stream. */
object StreamingWinnow {

  /** The continuous query: every micro-batch of `stream`
    * (doc_id, text) is winnow-checked against the corpus relations and
    * handed to `sink` as (new_id, corpus_id, n_shared_windows) —
    * append semantics, each document's overlaps emitted in the trigger
    * that carried it.
    *
    * foreachBatch is AT-LEAST-ONCE under recovery: a failed trigger
    * replays with the same batchId, so a non-idempotent sink must key
    * on (batchId, new_id, corpus_id) — the [[StreamingIngest]]
    * contract. */
  def overlapStream(stream: DataFrame, corpusFps: DataFrame,
                    corpusWindows: DataFrame, n: Int, w: Int,
                    checkpointDir: String)
                   (sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Dedup.winnowedPairsAgainst(batch, corpusFps, corpusWindows,
          n, w), batchId)
      }
      .start()
}
