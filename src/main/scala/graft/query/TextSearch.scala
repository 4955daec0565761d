package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword search over the documents table — the retrieval family the
  * reference lacks entirely (it searches vectors; a training-data
  * pipeline also needs term search for corpus inspection, filtering, and
  * eval-set mining).
  *
  * Two physical strategies with identical semantics:
  *
  *  - [[postings]] + [[searchPostings]] — the inverted-index path: build
  *    a (token, doc, tf) posting relation once (explode + map-side-
  *    combined count; the shuffle carries one fixed-width row per
  *    DISTINCT (doc, token), never the corpus text), then answer a query
  *    by an IN-filter over the postings and a doc-keyed count. At 100 TB
  *    the postings live bucketed by token (see
  *    [[graft.sources.BucketedTables]]) so a query's scan prunes to its
  *    terms' buckets and the per-doc aggregation is the only shuffle —
  *    candidate-sized, not corpus-sized.
  *  - [[searchScan]] — the index-free path: one narrow codegen
  *    projection computes every term's tf per document directly from the
  *    text; no shuffle at all. The right plan for one-off queries or
  *    when no index exists yet.
  *
  * Scoring is conjunctive tf ranking: a hit must contain EVERY term;
  * hits rank by (total tf desc, id) — integers only, so the driver
  * entry has an exact DuckDB oracle (idf/BM25-style log weights would
  * differ in the last ulp across engines; the integer core is the same
  * operator shape).
  */
object TextSearch {

  /** Inverted-index build: one row per (token, doc, tf). The explode is
    * narrow; the groupBy combines map-side so the shuffle is
    * posting-sized. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Conjunctive search over a posting relation: docs containing ALL
    * `terms`, with their summed term frequency. Postings are unique per
    * (tok, doc) by construction, so `count(*) == #terms` is the
    * conjunction test. */
  def searchPostings(post: DataFrame, idCol: String,
                     terms: Seq[String]): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "empty term list")
    post
      .where(col("tok").isin(ts: _*))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).cast("long").as("tf_total"),
        count(lit(1)).as("n_terms"))
      .where(col("n_terms") === ts.size)
      .select(col(idCol), col("tf_total"))
  }

  /** Index-free conjunctive search: per-term tf via a codegen'd
    * array-filter over the tokens — one narrow projection, no shuffle,
    * no index. Same output as [[searchPostings]] over [[postings]]. */
  def searchScan(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String]): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "empty term list")
    val toks = split(col(textCol), " ")
    val tfs = ts.map(t => size(filter(toks, x => x === t)).cast("long"))
    docs
      .select(col(idCol), tfs.reduce(_ + _).as("tf_total"),
        tfs.map(tf => when(tf > 0, 1).otherwise(0)).reduce(_ + _).as("__n"))
      .where(col("__n") === ts.size)
      .select(col(idCol), col("tf_total"))
  }

  /** Ranked search: conjunctive hits ordered and ranked by
    * (tf_total desc, id). The global window runs over the HIT SET only —
    * candidate-sized, not corpus-sized (same discipline as
    * [[graft.pipeline.TextAnalysis.topVocabulary]]). */
  def rankedSearch(docs: DataFrame, idCol: String, textCol: String,
                   terms: Seq[String], k: Int): DataFrame =
    searchScan(docs, idCol, textCol, terms)
      .orderBy(col("tf_total").desc, col(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("tf_total").desc, col(idCol)))
          .cast("long"))
      .select(col("rank"), col(idCol), col("tf_total"))
}
