package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.{bandKeys, firstEqualIdx, hashedTokenSet,
  interSortedSize, minhashSig, minhashSigOPH}

/** Streaming incremental dedup: a STREAM of new documents checked
  * against a static stored corpus — the continuous form of
  * [[graft.pipeline.Dedup.minHashLshPairsBipartite]] (whose batch output
  * is the oracle-gated semantics; StreamingDedupSpec asserts the
  * streaming path emits the identical pair relation).
  *
  * Two prepared STATIC relations, both persistable (at 100 TB the band
  * relation lives bucketed by (k, b) — see graft.sources.BucketedTables
  * — so daily batches join the layout without re-hashing history):
  *  - [[corpusBands]] (corpus_id, c_sz, c_bands, b, k): one row per
  *    (doc, band). The 32-long band array rides along to support the
  *    emit-once filter; ~bands×8 B per row — the documented cost of
  *    keeping the stream side stateless.
  *  - [[corpusSets]] (corpus_id, c_hset, c_sz): the hashed token sets
  *    for exact verification.
  *
  * The streaming query is two STREAM-STATIC inner joins (no watermarks,
  * no state): micro-batch docs → band keys (narrow projections; the new
  * doc's hset and bands ride with its rows — micro-batch-sized, not
  * corpus-sized) → equi-join on (k, b) against [[corpusBands]] with the
  * emit-once `firstEqualIdx` + size filters → join candidates to
  * [[corpusSets]] on corpus_id → exact merge-intersection verify.
  * Output: (new_id, corpus_id, inter, union_sz) at J ≥ t, appended in
  * the trigger that carried the new document.
  */
object StreamingDedup {

  /** Static corpus band relation: (corpus_id, c_sz, c_bands, b, k). */
  def corpusBands(corpusDocs: DataFrame, numHashes: Int = 128,
                  bands: Int = 32, oph: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    corpusSets(corpusDocs)
      .withColumn("c_bands", bandKeys(sig(col("c_hset"), numHashes, oph), bands))
      .select(col("corpus_id"), col("c_sz"), col("c_bands"),
        posexplode(col("c_bands")).as(Seq("b", "k")))
  }

  /** Static corpus verification relation: (corpus_id, c_hset, c_sz). */
  def corpusSets(corpusDocs: DataFrame): DataFrame =
    corpusDocs.select(col("doc_id").as("corpus_id"),
        hashedTokenSet(col("text")).as("c_hset"))
      .withColumn("c_sz", size(col("c_hset")).cast("long"))

  private def sig(hset: org.apache.spark.sql.Column, numHashes: Int,
                  oph: Boolean) =
    if (oph) minhashSigOPH(hset, numHashes) else minhashSig(hset, numHashes)

  /** Verified near-dup pairs between a document stream (doc_id, text)
    * and the prepared corpus relations. Ids must be disjoint across
    * sides. Works identically on a batch DataFrame. */
  def dedupPairs(stream: DataFrame, corpusBands: DataFrame,
                 corpusSets: DataFrame, thresholdPct: Int,
                 numHashes: Int = 128, bands: Int = 32,
                 oph: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val keyed = stream
      .select(col("doc_id").as("new_id"), hashedTokenSet(col("text")).as("hset"))
      .withColumn("n_sz", size(col("hset")).cast("long"))
      .withColumn("n_bands", bandKeys(sig(col("hset"), numHashes, oph), bands))
      .select(col("new_id"), col("hset"), col("n_sz"), col("n_bands"),
        posexplode(col("n_bands")).as(Seq("b", "k")))
    val cand = keyed.join(corpusBands, Seq("k", "b"))
      .where(col("new_id") =!= col("corpus_id") &&
        col("n_sz") * 100 >= col("c_sz") * thresholdPct &&
        col("c_sz") * 100 >= col("n_sz") * thresholdPct &&
        firstEqualIdx(col("n_bands"), col("c_bands")) === col("b"))
      .select(col("new_id"), col("corpus_id"), col("hset"), col("n_sz"))
    cand.join(corpusSets, "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        interSortedSize(col("hset"), col("c_hset")).as("inter"),
        (col("n_sz") + col("c_sz")).as("sz_sum"))
      .withColumn("union_sz", col("sz_sum") - col("inter"))
      .where(col("inter") * 100 >= col("union_sz") * thresholdPct)
      .select(col("new_id"), col("corpus_id"), col("inter"), col("union_sz"))
  }
}
