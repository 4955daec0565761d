package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.pipeline.{TextAnalysis, Web}

/** Streaming ingest forms of the corpus-statistics states — n-gram
  * DIVERSITY ([[graft.pipeline.TextAnalysis.ngramDiversityState]]) and
  * ANCHOR TEXT ([[graft.pipeline.Web.anchorTextState]]) — for the
  * crawl/ingest pipeline that wants the reports kept current as shards
  * arrive rather than recomputed from the corpus.
  *
  * Decomposition mirrors [[StreamingAnomaly]]/[[StreamingDrift]], so
  * the streaming result is batch-identical (StreamingCorpusStatsSpec
  * asserts it trigger by trigger): each micro-batch contributes its own
  * state relation, which merges ADDITIVELY into the accumulated state —
  * micro-batches partition the stream's documents/pages disjointly,
  * which is exactly the doc/page-disjointness the batch merge functions
  * contract on — and the report functions read the accumulated relation
  * unchanged. The anchor state stays (dst, anchor, src)-keyed across
  * triggers precisely so the DISTINCT-host count survives a host that
  * links in many micro-batches.
  *
  * At 100 TB the diversity state is gram-vocabulary-sized and the
  * anchor state (dst, anchor, src)-sized; each trigger pays one
  * map-side-combined aggregate over its own batch only. foreachBatch is
  * AT-LEAST-ONCE under recovery: pair the fold with the
  * [[StreamingIngest]] batch-id ledger when a replayed trigger must not
  * double-merge. */
object StreamingCorpusStats {

  /** Diversity state of one (micro)batch of documents. */
  def diversityState(batch: DataFrame, groupCol: String, textCol: String,
                     n: Int): DataFrame =
    TextAnalysis.ngramDiversityState(batch, groupCol, textCol, n)

  /** Additive merge of two diversity states — the foreachBatch fold. */
  def mergeDiversity(a: DataFrame, b: DataFrame): DataFrame =
    TextAnalysis.mergeNgramCounts(a, b)

  /** The diversity report over the accumulated state — identical
    * columns and numbers to the batch operator on the same rows. */
  def diversityReport(accumulated: DataFrame, groupCol: String): DataFrame =
    TextAnalysis.ngramDiversityFromState(accumulated, groupCol)

  /** Anchor-text state of one (micro)batch of pages. */
  def anchorState(batch: DataFrame, urlCol: String,
                  htmlCol: String): DataFrame =
    Web.anchorTextState(batch, urlCol, htmlCol)

  /** Additive merge of two anchor states — the foreachBatch fold. */
  def mergeAnchor(a: DataFrame, b: DataFrame): DataFrame =
    Web.mergeAnchorState(a, b)

  /** The anchor-text report over the accumulated state. */
  def anchorReport(accumulated: DataFrame): DataFrame =
    Web.anchorTextsFromState(accumulated)
}
