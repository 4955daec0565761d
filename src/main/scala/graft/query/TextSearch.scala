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

  /** FUZZY search: expand each query term to every vocabulary token
    * within Levenshtein `maxDist` (typo tolerance — "serach" still
    * finds "search"), then score docs by how many ORIGINAL query terms
    * they match through any expansion, tf summed as the tiebreak.
    *
    * Scale shape: the expansion scans the VOCABULARY relation (token,
    * df), never the corpus — a length-band prefilter (\|len(v)−len(q)\|
    * ≤ maxDist) cuts the Levenshtein work before it runs, and the
    * query side is a handful of literal rows, so the "cross" join is a
    * broadcast of almost nothing against a vocabulary-sized scan. The
    * expanded term set then drives ONE posting-relation semi-join —
    * posting-sized shuffle, identical to exact search. Returns
    * (doc, n_query_terms matched, tf_total) sorted best-first.
    *
    * `metric` picks the edit distance: "levenshtein" (default; the
    * early-exit 3-arg built-in) or "damerau"
    * ([[graft.functions.FastFunctions.damerauLevenshtein]]) — under
    * plain Levenshtein a TRANSPOSITION typo ("tabel" for "table")
    * costs 2 and escapes a maxDist=1 expansion; Damerau-Levenshtein
    * charges it 1, the classic typo-tolerance win. The length-band
    * prefilter is valid for both (a transposition never changes
    * length). */
  def fuzzySearch(post: DataFrame, vocab: DataFrame, idCol: String,
                  terms: Seq[String], maxDist: Int,
                  metric: String = "levenshtein"): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "empty term list")
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val spark = post.sparkSession
    import spark.implicits._
    val q = ts.toDF("q")
    val withinDist = metric match {
      case "levenshtein" => levenshtein(col("tok"), col("q"), maxDist) >= 0
      case "damerau" =>
        graft.functions.FastFunctions
          .damerauLevenshtein(col("tok"), col("q")) <= maxDist
      case other => throw new IllegalArgumentException(
        s"fuzzySearch metric must be levenshtein or damerau, got $other")
    }
    val expanded = vocab.select(col("tok"))
      .crossJoin(broadcast(q))
      .where(abs(length(col("tok")) - length(col("q"))) <= maxDist &&
        withinDist)
    val matches = post.join(expanded, Seq("tok"))
    // a token within range of TWO query terms counts once toward tf
    // (distinct (doc, tok)) but credits both terms' coverage
    val nq = matches.groupBy(col(idCol))
      .agg(countDistinct(col("q")).as("n_query_terms"))
    val tf = matches.select(col(idCol), col("tok"), col("tf")).distinct()
      .groupBy(col(idCol))
      .agg(sum(col("tf")).cast("long").as("tf_total"))
    nq.join(tf, idCol)
      .orderBy(col("n_query_terms").desc, col("tf_total").desc,
        col(idCol).asc)
  }

  /** PREFIX search (the autocomplete / wildcard-suffix shape):
    * expand `prefix` to every vocabulary token starting with it, then
    * one posting semi-join — same expansion discipline as
    * [[fuzzySearch]] (the prefix test scans the VOCABULARY relation,
    * never the corpus; with the vocab stored sorted the startswith
    * predicate is a range scan). Returns (doc, n_tokens matched,
    * tf_total) best-first. */
  def prefixSearch(post: DataFrame, vocab: DataFrame, idCol: String,
                   prefix: String): DataFrame = {
    require(prefix.nonEmpty, "empty prefix")
    val expanded = vocab.select(col("tok"))
      .where(col("tok").startsWith(prefix))
    post.join(expanded, Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("tf")).cast("long").as("tf_total"))
      .orderBy(col("tf_total").desc, col(idCol).asc)
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

  /** Positional inverted index: one fixed-width row per token
    * OCCURRENCE (token, id, pos) — [[postings]] with positions kept, the
    * relation phrase and proximity queries need. Narrow explode, no
    * shuffle; at 100 TB it lives bucketed by token like [[postings]]. */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))

  /** Exact-phrase search over a positional posting relation: documents
    * containing the consecutive token sequence `phrase`, with the exact
    * occurrence count (overlapping occurrences count separately).
    *
    * Positional intersection in ONE pass: postings for the phrase's
    * terms join a broadcast (tok, slot) relation, every match votes for
    * the occurrence START it implies (`pos − slot`), and a start that
    * collects all `m` slots is an occurrence. Because `post` carries
    * one row per OCCURRENCE (unique (id, pos) — the
    * [[positionalPostings]] contract), slot i can land on a given
    * (id, start) at most once, so the slot count is a plain `count(*)`
    * — no distinct-aggregate expansion, exactly two shuffles (the
    * start votes, then the per-doc count; plan-audited). Both are
    * candidate-sized (phrase-term postings only), the corpus text
    * never moves; repeated phrase terms vote for several starts and
    * stay correct. */
  def phraseSearch(post: DataFrame, idCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val slots = post.sparkSession.createDataFrame(
      phrase.zipWithIndex.map { case (t, i) => (t, i) })
      .toDF("tok", "slot")
    post.join(broadcast(slots), "tok")
      .groupBy(col(idCol), (col("pos") - col("slot")).as("start"))
      .agg(count(lit(1)).as("n_slots"))
      .where(col("n_slots") === phrase.size && col("start") >= 0)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_occurrences"))
  }

  /** Index-free exact-phrase search: counts occurrences with one
    * codegen'd higher-order filter over each doc's token array — no
    * shuffle, no index; same output as [[phraseSearch]] over
    * [[positionalPostings]]. The right plan for one-off queries. */
  def phraseScan(docs: DataFrame, idCol: String, textCol: String,
                 phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val toks = split(col(textCol), " ")
    val m = phrase.size
    val cnt = when(size(toks) >= m,
      size(filter(sequence(lit(0), size(toks) - lit(m)), s =>
        phrase.zipWithIndex.map { case (t, i) =>
          element_at(toks, (s + lit(i + 1)).cast("int")) === lit(t)
        }.reduce(_ && _)))).otherwise(lit(0))
    docs.select(col(idCol), cnt.cast("long").as("n_occurrences"))
      .where(col("n_occurrences") > 0)
  }

  /** Proximity (NEAR-k) search over a positional posting relation:
    * documents where `termA` and `termB` co-occur within `k` tokens
    * (|posA − posB| ≤ k, either order), with the exact count of
    * qualifying position pairs. The join touches the two terms'
    * postings only — candidate-sized, never the corpus — and the
    * distance predicate rides the join condition so Spark plans it as
    * a single shuffled join on the id with a residual filter. */
  def proximitySearch(post: DataFrame, idCol: String, termA: String,
                      termB: String, k: Int): DataFrame = {
    require(k >= 1, s"window must be >= 1, got $k")
    require(termA != termB,
      "identical terms: use phraseSearch or tf on a single term")
    val a = post.where(col("tok") === termA)
      .select(col(idCol), col("pos").as("pa"))
    val b = post.where(col("tok") === termB)
      .select(col(idCol), col("pos").as("pb"))
    a.join(b, Seq(idCol))
      .where(abs(col("pa") - col("pb")) <= k)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_pairs"))
  }

  /** Search-result snippets (keyword-in-context): for each document
    * matching the exact phrase, the FIRST occurrence's 0-based token
    * position, the total occurrence count, and the phrase with `ctx`
    * tokens of context on each side — one codegen projection over the
    * token array, no shuffle (the display step after [[phraseScan]] /
    * [[phraseSearch]] picks its hit page). */
  def phraseSnippets(docs: DataFrame, idCol: String, textCol: String,
                     phrase: Seq[String], ctx: Int = 3): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    require(ctx >= 0, s"ctx must be >= 0, got $ctx")
    val toks = split(col(textCol), " ")
    val m = phrase.size
    def startsOf(tk: org.apache.spark.sql.Column): org.apache.spark.sql.Column
        = when(size(tk) >= m,
      filter(sequence(lit(0), size(tk) - lit(m)), s =>
        phrase.zipWithIndex.map { case (t, i) =>
          element_at(tk, (s + lit(i + 1)).cast("int")) === lit(t)
        }.reduce(_ && _))).otherwise(array().cast("array<int>"))
    // fan out: the position-filter projection scans every token of
    // every document per phrase term — per-row-heavy work a
    // single-split source would serialize into one task (round-15
    // profile: a 1.3 s one-task job); identity at data scale. The
    // match gate rides an EXPLODE (0 rows for a non-matching doc, 1
    // carrying the position list otherwise) instead of a
    // where(size > 0): the optimizer pushes a plain filter below the
    // fan-out repartition and re-evaluates the whole position scan in
    // the single-split scan task — a generated column cannot be pushed
    // below its Generate, so the heavy expression stays fanned and
    // evaluates ONCE.
    graft.functions.PlanShape.fanOut(docs)
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(filter(array(startsOf(col("__toks"))),
          a => size(a) > 0)).as("__starts"))
      .select(col(idCol),
        size(col("__starts")).cast("long").as("n_occurrences"),
        element_at(col("__starts"), 1).cast("long").as("first_pos"),
        array_join(slice(col("__toks"),
          greatest(element_at(col("__starts"), 1) - lit(ctx), lit(0)) + 1,
          element_at(col("__starts"), 1)
            - greatest(element_at(col("__starts"), 1) - lit(ctx), lit(0))
            + lit(m + ctx)), " ").as("snippet"))
  }

  /** BM25 relevance scores (Robertson & Zaragoza 2009) for the DISJUNCTIVE
    * hit set (any term matches): per term,
    * idf·tf·(k1+1) / (tf + k1·(1−b + b·len/avglen)), with
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) — the standard ranking
    * function behind every production keyword engine, layered on the same
    * index-free scan as [[searchScan]].
    *
    * Physical shape: ONE corpus aggregate computes N, avg doc length,
    * and every term's document frequency in a single pass (counts are
    * integers in doubles — exact, order-insensitive); idf values then
    * ride as plan literals into a second narrow projection, so scoring
    * itself shuffles nothing. Output: (id, n_match, bm25_r4) for
    * matching docs, score rounded to 4 decimals. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "empty term list")
    val toks = split(col(textCol), " ")
    val dl = size(toks).cast("double")
    val tfCols = ts.map(t => size(filter(toks, x => x === t)).cast("double"))
    val aggs = count(lit(1)).cast("double").as("n") +:
      avg(dl).as("avglen") +:
      ts.zip(tfCols).map { case (t, tf) =>
        sum(when(tf > 0, 1.0).otherwise(0.0)).as(s"df_$t") }
    val stats = docs.agg(aggs.head, aggs.tail: _*).head()
    val n = stats.getDouble(0)
    val avglen = stats.getDouble(1)
    val idfs = ts.indices.map { i =>
      val df = stats.getDouble(2 + i)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    val norm = lit(k1) * (lit(1 - b) + lit(b) * dl / lit(avglen))
    val score = ts.indices.map { i =>
      lit(idfs(i)) * tfCols(i) * lit(k1 + 1) / (tfCols(i) + norm)
    }.reduce(_ + _)
    val nMatch = tfCols.map(tf => when(tf > 0, 1).otherwise(0)).reduce(_ + _)
    docs.select(col(idCol), nMatch.cast("long").as("n_match"),
        round(score, 4).as("bm25_r4"))
      .where(col("n_match") > 0)
  }
}
