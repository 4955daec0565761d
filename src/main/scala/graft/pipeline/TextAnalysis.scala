package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Everything here is pure `org.apache.spark.sql.functions` — no UDFs —
  * so every operator stays inside whole-stage codegen and runs as one
  * narrow projection per document: no shuffle at any scale.
  *
  * Oracle discipline: query outputs are integers/ids only (counts, keys,
  * floor-scaled scores). Ratios are exposed as (numerator, denominator)
  * pairs or integer basis points so the DuckDB comparison never hashes a
  * float that could differ in the last ulp.
  */
object TextAnalysis {

  /** Whitespace tokenizer — one token per space-separated run. This is
    * the ORACLE-CONTRACT tokenizer: every gate entry built on it encodes
    * `split(text, ' ')` in its DuckDB SQL, so it stays the default here.
    * For real multilingual text use [[unicodeTokens]] (and the trained
    * subword vocabulary in [[Bpe]]); on the driver's space-separated
    * ASCII corpus the two segment identically. */
  def tokens(text: Column): Column = split(text, " ")

  /** Unicode-aware tokenizer: letter(+combining-mark) runs, digit runs,
    * single non-space symbols — [[Bpe.pretokenPattern]], the GPT-2-style
    * pre-token shape, restricted to Unicode classes Java regex and RE2
    * agree on. Punctuation separates (unlike [[tokens]], which glues
    * "word," into one token). */
  def unicodeTokens(text: Column): Column = Bpe.pretokens(text)

  /** A small English stopword set for quality scoring (heuristic; the
    * point is the operator shape, not the lexicon). */
  val stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is")

  /** Token statistics per document: total tokens, distinct tokens,
    * characters. `n_tokens` uses whitespace splitting; `n_distinct` is the
    * vocabulary size used by the dedup family. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("n_distinct"),
      length(col("text")).cast("long").as("n_chars_computed"))

  /** Quality signals per document, integer-only:
    *  - stop_cnt / n_tokens: stopword ratio basis
    *  - avg token length in tenths of a char: floor(10 * chars_in_tokens / n_tokens)
    *  - quality score in percent: floor(100 * stop_cnt / n_tokens)
    * Deterministic across engines because all divisions are floor(int/int).
    */
  def qualitySignals(docs: DataFrame): DataFrame =
    withQualitySignals(docs).select(
      col("doc_id"), col("n_tokens"), col("stop_cnt"), col("stop_pct"),
      col("avg_tok_len_x10"))

  /** [[qualitySignals]] appended to the input's own columns — one codegen
    * projection, no re-join — for composites (e.g. [[CorpusClean]]) that
    * need both the signals and the document payload downstream. */
  def withQualitySignals(docs0: DataFrame): DataFrame = {
    val docs = graft.functions.PlanShape.fanOut(docs0)
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val stopArr = typedlit(stopwords)
    val stopCnt = size(filter(toks, t => array_contains(stopArr, t))).cast("long")
    val letterChars = (length(col("text")) - (size(toks) - lit(1))).cast("long")
    docs.select(
      col("*"),
      nTok.as("n_tokens"),
      stopCnt.as("stop_cnt"),
      floor(lit(100) * stopCnt.cast("double") / nTok.cast("double")).cast("long").as("stop_pct"),
      floor(lit(10) * letterChars.cast("double") / nTok.cast("double")).cast("long").as("avg_tok_len_x10"))
  }

  /** Character-n-gram language-ID heuristic. Scores each document against
    * tiny per-language trigram profiles and picks the argmax; ties broken
    * lexicographically. Purely illustrative profiles — the synthetic corpus
    * is same-vocabulary, so accuracy against the `lang` column is not the
    * contract; determinism and the operator shape (a codegen'd projection,
    * no shuffle) are.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "ing", "ion", "is "),
    "de" -> Seq("der", "ein", "sch", "ich", "und"),
    "es" -> Seq("que", "de ", "la ", "os ", "ión"),
    "fr" -> Seq("les", "ent", "de ", "ion", "que"),
    "zh" -> Seq("de ", "shi", "zh", "ng ", "ian"))

  def langId(docs: DataFrame): DataFrame = {
    // score(lang) = number of profile trigrams present; argmax with
    // lexicographic tiebreak via a struct-max over (score, revLang).
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      val score = grams.map(g => when(col("text").contains(g), 1).otherwise(0))
        .reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    // langs are sorted ascending and a later entry replaces the running
    // best only on strictly greater score → smallest lang wins ties.
    val best = scored.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    docs.select(col("doc_id"), best.getField("lang").as("pred_lang"))
  }

  /** Subword token counting — the BPE-ish approximation: maximal runs of
    * lowercase letters, digits, or single non-space symbols, the shape a
    * byte-pair tokenizer's pre-tokenizer produces. Pure regex projection
    * (codegen'd, no shuffle); the count is the usual proxy for LLM token
    * budgets when the real vocabulary is unavailable. */
  def subwordStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("long").as("n_subwords"),
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
        .cast("long").as("n_number_runs"))

  /** Occurrences of a literal phrase in `text` via the replace-length
    * identity (len(t) − len(replace(t, p, ''))) / len(p) — exact,
    * engine-portable, and a pure codegen projection (no regex engine,
    * no UDF). Case-sensitive; counts overlapping occurrences as the
    * left-to-right replace does (i.e. non-overlapping). */
  def phraseCount(text: Column, phrase: String): Column = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    ((length(text) -
      length(call_function("replace", text, lit(phrase), lit("")))) /
      lit(phrase.length)).cast("long")
  }

  /** Total hits across a literal blocklist — the safety/compliance
    * filter pass (banned phrases, trademarked strings, known spam
    * templates). The blocklist is compiled INTO the projection (one
    * column expression per phrase, folded), so the scan stays
    * whole-stage-codegen with zero joins at any corpus size; for
    * blocklists beyond a few hundred entries switch to the token-join
    * path ([[graft.query.TextSearch]] postings). */
  def blocklistHits(text: Column, patterns: Seq[String]): Column = {
    require(patterns.nonEmpty, "need at least one blocklist pattern")
    patterns.map(p => phraseCount(text, p)).reduce(_ + _)
  }

  /** Flesch reading-ease over whitespace words, [.!?]+ sentence ends
    * and [aeiouy]+ vowel-group syllables (the standard heuristic when
    * no dictionary is licensed) — the READABILITY quality signal next
    * to the structural ones in [[qualitySignals]]. All three counts
    * are clamped to ≥ 1 so the score is total; the score itself is
    * floor-scaled ×1000 with a fixed double association order, so any
    * engine reproduces it bit-for-bit. Pure regex projection — no
    * shuffle. Output: doc_id + (n_words, n_sentences, n_syllables,
    * flesch_x1000); 206.835 − 1.015·(w/s) − 84.6·(syl/w), higher =
    * easier. */
  def readability(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val words = greatest(
      when(length(trim(t)) === 0, lit(0))
        .otherwise(size(split(trim(t), "\\s+"))).cast("long"), lit(1L))
    val sents = greatest(
      size(regexp_extract_all(t, lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    val sylls = greatest(
      size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
        .cast("long"), lit(1L))
    docs.select(col("doc_id"),
      words.as("n_words"), sents.as("n_sentences"),
      sylls.as("n_syllables"),
      floor((lit(206.835) -
        lit(1.015) * (words.cast("double") / sents.cast("double")) -
        lit(84.6) * (sylls.cast("double") / words.cast("double"))) *
        lit(1000.0)).cast("long").as("flesch_x1000"))
  }

  /** Script-mix detection — the multilingual curation signal the
    * n-gram [[langId]] can't give: that model separates languages
    * WITHIN a script family; a Cyrillic or CJK document defeats it
    * outright, while Unicode script classes identify the writing
    * system in one regex projection. Counts per major script + a
    * fixed-precedence dominant verdict (ties break latin → greek →
    * cyrillic → han; all-zero → none). Pure codegen regex projection,
    * no shuffle. Route by `dominant` first, then run the per-script
    * language model. */
  def scriptSignals(docs: DataFrame,
                    textCol: String = "text"): DataFrame = {
    def cnt(cls: String): Column =
      length(regexp_replace(col(textCol), s"[^\\p{Is$cls}]", ""))
        .cast("long")
    val latin = cnt("Latin")
    val greek = cnt("Greek")
    val cyr = cnt("Cyrillic")
    val han = cnt("Han")
    docs.select(col("doc_id"),
      latin.as("n_latin"), greek.as("n_greek"),
      cyr.as("n_cyrillic"), han.as("n_han"),
      when(latin >= greek && latin >= cyr && latin >= han && latin > 0,
        "latin")
        .when(greek >= cyr && greek >= han && greek > 0, "greek")
        .when(cyr >= han && cyr > 0, "cyrillic")
        .when(han > 0, "han")
        .otherwise("none").as("dominant"))
  }

  /** Content fingerprint: 128-bit MD5 of the text (hex) plus a 64-bit
    * decimal prefix — the exact-dedup key. Identical in Spark and any SQL
    * engine, unlike engine-specific hash functions. A Karp–Rabin rolling
    * fingerprint over shingles lives in
    * [[graft.functions.Kernels.shingleHashesSorted]]. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text")).as("fp_md5"),
      substring(md5(col("text")), 1, 15).as("fp_prefix"))

  /** C4-style rule-based LINE filtering (Raffel et al. 2020 §2.2): keep
    * a line only if it has ≥ `minWords` whitespace words, ends in
    * terminal punctuation (when `requirePunct`), and contains none of
    * the `banned` phrases (case-insensitive) — the deterministic
    * cleaning pass C4 runs before any model-based scoring. Unlike
    * [[graft.pipeline.Dedup.removeBoilerplate]] (cross-doc, needs the
    * corpus) every rule here is LINE-LOCAL, so the whole operator is one
    * narrow higher-order-function projection per document: no shuffle,
    * no second scan, at any corpus size.
    *
    * Counters classify each dropped line by its FIRST failing rule
    * (short → banned → no-punct), so
    * n_kept + n_short + n_banned + n_no_punct = n_lines exactly.
    * Output: (doc_id, n_lines, n_kept, n_short, n_banned, n_no_punct,
    * clean_text). Banned phrases must be lowercase literals (they are
    * matched by substring against the lowercased line). */
  def c4LineFilters(docs: DataFrame, delim: String = "\n",
      minWords: Int = 3, banned: Seq[String] = Seq("lorem ipsum", "{"),
      requirePunct: Boolean = true): DataFrame = {
    val qdelim = java.util.regex.Pattern.quote(delim)
    val lines = split(col("text"), qdelim, -1)
    // C4's min-words rule counts WHITESPACE-delimited words: split on
    // whitespace runs and drop empties (a bare split(" ") would count
    // the empty tokens consecutive spaces produce as words)
    def isShort(l: Column): Column =
      size(filter(split(l, "\\s+"), w => length(w) > 0)) < minWords
    def isBanned(l: Column): Column =
      banned.map(b => l.contains(b)).reduce(_ || _)
    def noPunct(l: Column): Column =
      if (requirePunct) !l.rlike("[.!?]$") else lit(false)
    def kept(l: Column): Column = {
      val low = lower(l)
      !isShort(l) && !isBanned(low) && !noPunct(l)
    }
    def countWhere(f: Column => Column): Column =
      size(filter(lines, l => f(l))).cast("long")
    docs.select(
      col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      countWhere(kept).as("n_kept"),
      countWhere(isShort).as("n_short"),
      countWhere(l => !isShort(l) && isBanned(lower(l))).as("n_banned"),
      countWhere(l => !isShort(l) && !isBanned(lower(l)) && noPunct(l))
        .as("n_no_punct"),
      array_join(filter(lines, l => kept(l)), delim).as("clean_text"))
  }

  /** Canonicalized text for normalization-aware dedup: lowercase,
    * non-alphanumerics to spaces, space runs collapsed, trimmed. Pure
    * codegen projection; patterns restricted to classes that mean the
    * same thing in Java regex and RE2, so SQL engines reproduce it. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Compression-ratio quality signal (the Dolma/RedPajama gzip-ratio
    * heuristic, one codegen kernel call per row, no shuffle): near-random
    * prose deflates ~1:1, template/repeated boilerplate far below —
    * a language-agnostic repetition detector complementing the shingle
    * kernel in [[repetitionSignals]]. Output: (doc_id, n_bytes,
    * deflate_bytes, ratio_x100 = ⌊100·deflate/raw⌋). The byte counts are
    * zlib-dependent, so cross-engine gates assert INVARIANTS (bounds,
    * planted orderings), not byte equality. */
  def compressionSignals(docs: DataFrame): DataFrame = {
    val raw = octet_length(col("text")).cast("long")
    val dz = graft.functions.FastFunctions.deflateLen(col("text"))
    docs.select(col("doc_id"),
      raw.as("n_bytes"),
      dz.as("deflate_bytes"),
      when(raw > 0, floor(lit(100) * dz.cast("double") / raw.cast("double"))
        .cast("long")).otherwise(lit(0L)).as("ratio_x100"))
  }

  /** Unicode NFC canonical composition — a codegen kernel
    * ([[graft.functions.Kernels.nfcNormalize]], ASCII fast path): the
    * step before any hash-keyed dedup/linkage over multilingual text,
    * where a decomposed "é" (e + U+0301) and the precomposed é must
    * hash identically. */
  def nfc(text: Column): Column =
    graft.functions.FastFunctions.nfcNormalize(text)

  /** Unicode NFKC compatibility composition: [[nfc]] plus compatibility
    * folds — ligatures (ﬁ → fi), fullwidth forms (Ａ → A) — the fold
    * tokenizers want. No DuckDB twin exists, so this one is
    * spec-gated. */
  def nfkc(text: Column): Column =
    graft.functions.FastFunctions.nfkcNormalize(text)

  /** Accent/diacritic stripping ("café" → "cafe"): NFD, drop combining
    * marks, recompose — the search-normalization fold, one codegen
    * kernel call per row. */
  def stripAccents(text: Column): Column =
    graft.functions.FastFunctions.stripAccents(text)

  /** Unicode-robust canonical dedup key: accents stripped (which
    * subsumes NFC for the combining-mark cases — both decompositions of
    * "café" land on "cafe"), then [[normalizedText]]'s lowercase /
    * non-alphanumeric / space-run canonicalization. The key under which
    * "Crème  Brûlée!" and "creme brulee" are exact duplicates — still
    * one codegen projection per row. */
  def normalizedTextUnicode(text: Column): Column =
    normalizedText(stripAccents(text))

  /** Repetition quality signal (Gopher-style, Rae et al. 2021 §A1.1):
    * multiplicity of the most-repeated n-token shingle, total shingles,
    * and their floor-percent ratio — documents dominated by one repeated
    * phrase are boilerplate/spam. ONE kernel call per row, no shuffle
    * (the SQL formulation of the same quantity needs explode + groupBy
    * per document). Integer-only output. */
  def repetitionSignals(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.FastFunctions
          .shingleRepetition(tokens(col("text")), n).as("p"))
      .select(col("doc_id"),
        shiftright(col("p"), 32).as("max_rep"),
        col("p").bitwiseAND(lit(0xFFFFFFFFL)).as("n_shingles"))
      .withColumn("rep_pct", when(col("n_shingles") === 0, lit(0L))
        .otherwise(expr("(max_rep * 100) div n_shingles")))

  /** Gopher-style rule-based quality DECISION (Rae et al. 2021 §A1.1
    * adapted to this corpus's integer signals): four binary rules —
    * token count within [minTokens, maxTokens], stopword percentage ≥
    * minStopPct (the "natural prose has function words" test), mean
    * token length within [minTokLenX10, maxTokLenX10] tenths, and
    * shingle repetition ≤ maxRepPct — each worth 25 points; `keep` =
    * score ≥ cutoff. The composite the individual signal operators
    * exist to feed: ONE projection (quality exprs + the repetition
    * kernel per row), no shuffle, integer-only output:
    * (doc_id, r_len, r_stop, r_tlen, r_rep, score, keep). */
  def gopherRules(docs: DataFrame, minTokens: Int = 50,
      maxTokens: Int = 100000, minStopPct: Int = 2,
      minTokLenX10: Int = 30, maxTokLenX10: Int = 100,
      maxRepPct: Int = 20, cutoff: Int = 75, n: Int = 3): DataFrame = {
    val flag = (c: Column) => when(c, 1L).otherwise(0L)
    withQualitySignals(docs)
      .withColumn("__gr_p", graft.functions.FastFunctions
        .shingleRepetition(tokens(col("text")), n))
      .withColumn("rep_pct", expr(
        "CASE WHEN (__gr_p & 4294967295) = 0 THEN 0L ELSE " +
          "(shiftright(__gr_p, 32) * 100) div (__gr_p & 4294967295) END"))
      .select(col("doc_id"),
        flag(col("n_tokens") >= minTokens &&
          col("n_tokens") <= maxTokens).as("r_len"),
        flag(col("stop_pct") >= minStopPct).as("r_stop"),
        flag(col("avg_tok_len_x10") >= minTokLenX10 &&
          col("avg_tok_len_x10") <= maxTokLenX10).as("r_tlen"),
        flag(col("rep_pct") <= maxRepPct).as("r_rep"))
      .withColumn("score",
        (col("r_len") + col("r_stop") + col("r_tlen") + col("r_rep")) * 25)
      .withColumn("keep", flag(col("score") >= cutoff))
  }

  /** Vocabulary growth curve (the Heaps'-law measurement): cumulative
    * distinct tokens vs cumulative token count in `orderCol` order,
    * sampled every `every` documents — the corpus-diversity diagnostic
    * (a saturating curve means new data adds volume, not vocabulary;
    * linear growth flags noise/ids leaking into the token stream).
    *
    * Exact without any distinct-over-prefix window: a token first seen
    * in document d contributes to every curve point ≥ d, so per-token
    * MIN(order) + a per-doc new-token count + ONE cumulative sum over
    * the doc-count-sized per-doc relation reproduces the running
    * distinct exactly. The corpus-wide window runs over per-DOC rows
    * (corpus/|docs| reduction before any single-partition step).
    * Output: (ord, cum_tokens, cum_vocab) at sampled points.
    *
    * Presence semantics: report points come from the DOC relation, not
    * the token stream — a document with NULL or empty text contributes
    * a zero-token row, so its ord still reports (and stays aligned with
    * [[vocabGrowthBucketed]], which follows the same rule). */
  def vocabGrowth(docs: DataFrame, orderCol: String = "doc_id",
                  every: Int = 50): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val toks = docs.select(col(orderCol).as("ord"),
      explode(tokens(col("text"))).as("tok"))
    val firstSeen = toks.groupBy("tok")
      .agg(min(col("ord")).as("first_ord"))
      .groupBy(col("first_ord").as("ord"))
      .agg(count(lit(1)).as("n_new"))
    // seed from docs so NULL/empty-text ords keep their report row
    // (explode of no tokens would otherwise drop the ord entirely)
    val perDoc = docs.groupBy(col(orderCol).as("ord")).agg(lit(1))
      .select("ord")
      .join(toks.groupBy("ord").agg(count(lit(1)).as("n_toks")),
        Seq("ord"), "left")
      .withColumn("n_toks", coalesce(col("n_toks"), lit(0L)))
      .join(firstSeen, Seq("ord"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ord"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    perDoc
      .withColumn("cum_tokens", sum(col("n_toks")).over(w))
      .withColumn("cum_vocab", sum(col("n_new")).over(w))
      .where(pmod(col("ord"), lit(every.toLong)) === 0)
      .select("ord", "cum_tokens", "cum_vocab")
  }

  /** The 100 TB twin of [[vocabGrowth]]: the unpartitioned cumulative
    * window runs over BUCKET sums — ⌈(ord + 1)/every⌉ buckets, i.e. the
    * CURVE's own row count (one per report point) instead of one row
    * per document — so the single-task window is output-sized no matter
    * the corpus (the round-10 verdict's vocabGrowth note). Bucket k > 0
    * holds ords (k−1)·every+1 … k·every and bucket 0 holds ord 0, so
    * the cumulative through bucket k is exactly the exact form's
    * cumulative through ord k·every; with a DENSE 0-based order column
    * (the [[TrainingData.denseIds]] output — the documented contract)
    * every report point exists and the two forms are EXACTLY equal —
    * including for NULL/empty-text documents, whose ords both forms
    * seed from the doc relation (zero tokens, row present).
    * Sparse order domains diverge by design: the exact form reports
    * only multiples of `every` that exist as ords, this twin reports
    * every bucket boundary up to the max ord. */
  def vocabGrowthBucketed(docs: DataFrame, orderCol: String = "doc_id",
                          every: Int = 50): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    // Exact floor division at any long magnitude, which neither `/`
    // (double: rounds past 2⁵³) nor decimal(38,0)÷BIGINT (result
    // decimal(38,6): HALF_UP at 6 places flips boundary ords once
    // every ≥ 2e6 — empirically confirmed) provides. decimal(20,0)
    // FIRST: the cast precedes the addition (no long wrap near
    // Long.MaxValue), and (21,0)÷(20,0) keeps scale 17 — the true
    // fraction is either 0 or ≥ 1/every ≥ 2⁻³¹, far above the
    // 5·10⁻¹⁸ rounding ulp, so the long truncation (toward zero;
    // ords are non-negative by the dense-0-based contract) is the
    // oracle's integer `//` exactly.
    val bucket = (c: org.apache.spark.sql.Column) =>
      ((c.cast("decimal(20,0)") + lit(every.toLong) - 1) /
        lit(every.toLong)).cast("long")
    val toks = docs.select(col(orderCol).as("ord"),
      explode(tokens(col("text"))).as("tok"))
    val newPerBucket = toks.groupBy("tok")
      .agg(min(col("ord")).as("first_ord"))
      .groupBy(bucket(col("first_ord")).as("b"))
      .agg(count(lit(1)).as("n_new"))
    // seed buckets from docs (the vocabGrowth presence rule): a bucket
    // whose documents are all NULL/empty-text still reports, with its
    // cumulative counts carried forward
    val toksPerBucket = docs
      .groupBy(bucket(col(orderCol)).as("b")).agg(lit(1))
      .select("b")
      .join(toks.groupBy(bucket(col("ord")).as("b"))
        .agg(count(lit(1)).as("n_toks")), Seq("b"), "left")
      .withColumn("n_toks", coalesce(col("n_toks"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    // a trailing PARTIAL bucket (max ord not a multiple of `every`)
    // would otherwise report a boundary ord beyond the data — drop it,
    // exactly the exact form's "no doc at that ord" behavior
    val maxOrd = docs.agg(max(col(orderCol)).cast("long").as("__mx"))
    toksPerBucket
      .join(newPerBucket, Seq("b"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_tokens", sum(col("n_toks")).over(w))
      .withColumn("cum_vocab", sum(col("n_new")).over(w))
      .select((col("b") * every).as("ord"), col("cum_tokens"),
        col("cum_vocab"))
      .crossJoin(broadcast(maxOrd))
      .where(col("ord") <= col("__mx"))
      .drop("__mx")
  }

  /** Cross-document novelty signal: how much of a document's n-gram mass
    * is corpus-RARE (document frequency ≤ rareDf). Boilerplate scores
    * near 0 (its n-grams recur everywhere); unique prose scores high; a
    * spike of rare n-grams inside an otherwise-templated source flags
    * noise/PII-ish content. The cross-doc statistic the per-doc quality
    * signals can't see.
    *
    * Shape: one df aggregation over distinct per-doc n-grams (the
    * shuffle carries (gram, partial df) — vocabulary-sized), a
    * candidate-sized join back, one doc-keyed count. Integer output:
    * (doc_id, n_grams, n_rare, rare_pct). */
  def noveltySignals(docs: DataFrame, n: Int = 2,
                     rareDf: Long = 1): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(graft.pipeline.TrainingData
        .ngramFingerprints(col("text"), n)).as("g"))
    val df = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val perDoc = grams.join(df, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(when(col("df") <= rareDf, 1L).otherwise(0L)), lit(0L))
          .as("n_rare"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .withColumn("rare_pct", when(col("n_grams") === 0, 0L)
        .otherwise(expr("(n_rare * 100) div n_grams")))
  }

  /** Corpus vocabulary by DOCUMENT frequency (tokens counted once per
    * document, the df a tokenizer-training or idf pipeline needs).
    * One explode + one hash-groupBy with map-side combine — the shuffle
    * carries (token, partial count), vocabulary-sized, not corpus-sized.
    * Output is filtered to df ≥ minDf (rare-token noise stays in the
    * executors, never collected anywhere). */
  def vocabulary(docs: DataFrame, minDf: Long = 2): DataFrame =
    docs.select(explode(array_distinct(tokens(col("text")))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)

  /** Top-k vocabulary with a dense deterministic rank by (df desc, tok).
    * The global sort sees only the pre-aggregated vocabulary; the rank
    * window runs over k rows after the limit. */
  def topVocabulary(docs: DataFrame, k: Int, minDf: Long = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    vocabulary(docs, minDf)
      .orderBy(col("df").desc, col("tok"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("df").desc, col("tok")))
          .cast("long"))
      .select("rank", "tok", "df")
  }

  /** Per-document (doc_id, w1, w2) bigram occurrences — one narrow
    * projection + explode, each position once (no shuffle). */
  private def bigramOccurrences(docs: DataFrame): DataFrame = {
    val ts = tokens(col("text"))
    val heads = slice(ts, lit(1), size(ts) - lit(1))
    val tails = slice(ts, lit(2), size(ts) - lit(1))
    docs.select(col("doc_id"),
        explode(zip_with(heads, tails,
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
  }

  /** Language-model fit score: how well each document matches a bigram
    * LM trained on a reference corpus (the CCNet quality idea — Wenzek
    * et al. 2020 score CommonCrawl against a Wikipedia KenLM and keep the
    * best-fitting fraction; here the LM is a corpus-trained add-one-
    * smoothed bigram model, so the signal is self-contained).
    *
    * Model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V), with counts from
    * `train` and V = train's unigram vocabulary size; unseen bigrams and
    * unseen contexts fall back to the smoothing mass (left joins). Each
    * scored position contributes the INTEGER floor(1e6 · p) — BIGINT
    * floor-division in both engines — so per-doc sums and means are
    * order-free integer arithmetic and the oracle never hashes a float.
    * Corpus-typical text scores high; out-of-distribution or shuffled
    * text scores low (DedupSpec-style discipline: the float-free twin of
    * mean log-likelihood; the ranking it induces is what the filter
    * consumes).
    *
    * Shape: one bigram explode over `train` feeding two vocabulary-sized
    * map-side-combined aggregations (bigram counts, context totals); one
    * bigram explode over `score` joined against those two relations and
    * summed per doc. At 100 TB the count relations stay vocabulary- not
    * corpus-sized (a natural-language bigram table broadcasts or at worst
    * hash-joins on w1/w2); nothing corpus-sized is ever collected — only
    * the scalar V reaches the driver.
    *
    * Output: (doc_id, n_bigrams, sum_p_x1e6, mean_p_x1e6), zeros for
    * docs with fewer than two tokens. */
  def bigramLmScores(train: DataFrame, score: DataFrame): DataFrame = {
    val trainBg = bigramOccurrences(train)
    val bigCnt = trainBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctxCnt = trainBg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v: Long = train
      .select(explode(tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t")).as("v")).head().getLong(0)
    val perDoc = bigramOccurrences(score)
      .join(bigCnt, Seq("w1", "w2"), "left")
      .join(ctxCnt, Seq("w1"), "left")
      .select(col("doc_id"),
        expr(s"(1000000 * (coalesce(c12, 0L) + 1L)) div (coalesce(c1, 0L) + ${v}L)")
          .as("p_x1e6"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("p_x1e6").as("sum_p_x1e6"))
    score.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_p_x1e6"), lit(0L)).as("sum_p_x1e6"))
      .withColumn("mean_p_x1e6", when(col("n_bigrams") === 0, 0L)
        .otherwise(expr("sum_p_x1e6 div n_bigrams")))
  }

  /** CCNet-style per-language quality bucketing (Wenzek et al. 2020,
    * the step after LM scoring): documents rank per language by the
    * [[bigramLmScores]] integer fit score against `train` and split
    * into `nBuckets` equal-frequency buckets — bucket 1 is the head
    * (best fit), the last bucket the tail. Rank order is
    * (mean_p_x1e6 DESC, doc_id), fully deterministic, so bucket
    * boundaries cannot flake on score ties.
    *
    * Shape: the scoring passes of [[bigramLmScores]] plus ONE window
    * per language partition over a three-column relation (id, lang,
    * score) — the window sorts within languages only, never globally,
    * and the text column never reaches it. CAUTION: at corpus scale
    * the HEAD language's partition is itself corpus-sized (a web crawl
    * is mostly English), so this exact path is a single-task sort of
    * billions of rows there — use [[qualityBucketsApprox]] at scale. */
  def qualityBuckets(train: DataFrame, docs: DataFrame,
                     langCol: String = "lang",
                     nBuckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLmScores(train, docs)
      .join(docs.select(col("doc_id"), col(langCol)), Seq("doc_id"))
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("mean_p_x1e6").desc, col("doc_id"))
    scored.select(col("doc_id"), col(langCol), col("mean_p_x1e6"),
      ntile(nBuckets).over(w).cast("long").as("bucket"))
  }

  /** The 100 TB path of [[qualityBuckets]]: the same per-language
    * CCNet terciles, but bucket boundaries come from
    * [[TrainingData.equalFreqBucket]]'s per-language integer score
    * histogram (mergeable aggregate + domain-sized cumulative window +
    * broadcast boundary arrays) instead of a per-language `ntile` —
    * so the head language never becomes a single-task corpus sort.
    * The LM score is already integer fixed-point (×1e6, ≤1e6 distinct
    * values), which bounds the histogram by construction. Divergence
    * vs the exact path is boundary-frontier only: a score-tie class
    * straddling a tercile boundary stays whole here (descending rank:
    * bucket 1 = best fit), and ntile's remainder rows may sit one
    * bucket over. */
  def qualityBucketsApprox(train: DataFrame, docs: DataFrame,
                           langCol: String = "lang",
                           nBuckets: Int = 3): DataFrame = {
    val scored = bigramLmScores(train, docs)
      .join(docs.select(col("doc_id"), col(langCol)), Seq("doc_id"))
      .select(col("doc_id"), col(langCol), col("mean_p_x1e6"))
    TrainingData.equalFreqBucket(scored, "mean_p_x1e6", Seq(langCol),
        nBuckets, descending = true)
      .select(col("doc_id"), col(langCol), col("mean_p_x1e6"), col("bucket"))
  }

  /** Corpus n-gram DIVERSITY report per group (source, language, …):
    * how much of a corpus is repeated n-gram mass — the
    * memorization-risk / template-detection statistic a training-data
    * pipeline reads before mixing a source in (self-repetition at the
    * corpus level, where [[repetitionSignals]] is per-document).
    *
    * Output per group, all exact integers: `n_grams` (total n-token
    * windows), `n_distinct`, `n_repeats` (= n_grams − n_distinct, the
    * repeated mass), `collision_pairs` (Σ c·(c−1)/2 over gram
    * frequencies — the unnormalized Simpson collision count: the
    * number of window PAIRS that are verbatim equal; exact because
    * c·(c−1) is always even). Fingerprints are md5 of the joined gram
    * (the [[TrainingData.ngramFingerprints]] engine-parity discipline),
    * NOT per-doc-deduplicated — diversity counts occurrences.
    *
    * Scale shape: one data-sized exchange on the (group, gram) key
    * feeding both aggregate levels
    * ([[graft.functions.PlanShape.dataSizedParts]]); frequencies widen
    * to decimal(20,0) before the collision product (c² overflows a
    * long past ~3e9 occurrences of one gram). */
  def ngramDiversity(docs: DataFrame, groupCol: String, textCol: String,
                     n: Int): DataFrame =
    ngramDiversityFromState(
      ngramDiversityState(docs, groupCol, textCol, n), groupCol)

  /** The mergeable STATE behind [[ngramDiversity]]: per-(group, gram)
    * occurrence counts `(grp, g, c)`. Counts over DOC-DISJOINT batches
    * are ADDITIVE (each document contributes its windows once, in
    * exactly one batch), so a daily-ingest pipeline keeps this relation
    * as a persisted table and folds each arriving batch in via
    * [[mergeNgramCounts]] — no corpus rescan, the same
    * persistable-state shape as [[graft.pipeline.Dedup.lineDocCounts]].
    * One data-sized exchange on the (grp, g) key
    * ([[graft.functions.PlanShape.dataSizedParts]]). */
  def ngramDiversityState(docs: DataFrame, groupCol: String,
                          textCol: String, n: Int,
                          fanOutInput: Boolean = true): DataFrame = {
    val grams = gramRelation(docs, groupCol, textCol, n, fanOutInput)
    grams
      .repartition(graft.functions.PlanShape.dataSizedParts(grams),
        col("grp"), col("g"))
      .groupBy("grp", "g").agg(count(lit(1)).as("c"))
  }

  /** One (grp, g) row per n-token window — the shared explode behind
    * the exact and sketch diversity states (md5 fingerprints, the
    * [[TrainingData.ngramFingerprints]] engine-parity discipline, NOT
    * per-doc-deduplicated: diversity counts occurrences). */
  private def gramRelation(docs0: DataFrame, groupCol: String,
                           textCol: String, n: Int,
                           fanOutInput: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // fan-out before the window-fingerprint explode (the family's
    // dominant per-row work; single-split sources serialize it).
    // `fanOutInput = false` is for callers that re-derive the state
    // MANY times from one small source without materializing it: there
    // the per-pass fan-out exchange costs more than the serial explode
    // it parallelizes — measured round 14. (The incremental merge gate
    // used this opt-out until round 15, when it switched to deriving
    // each state once, fanned + localCheckpointed.)
    val docs =
      if (fanOutInput) graft.functions.PlanShape.fanOut(docs0) else docs0
    val toks = split(col(textCol), " ")
    val m = size(toks) - lit(n - 1)
    docs.select(col(groupCol).as("grp"),
      explode(when(m >= 1, transform(sequence(lit(1), m),
          i => md5(array_join(slice(toks, i, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))).as("g"))
  }

  /** Merge two [[ngramDiversityState]] relations built over
    * DOC-DISJOINT batches (a document in both would double-count its
    * windows): one map-side-combined sum per (grp, g) — gram-vocabulary
    * sized, never corpus-sized. */
  def mergeNgramCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("grp", "g").agg(sum(col("c")).as("c"))

  /** The SKETCH form of the diversity state for corpora where even the
    * exact (group, gram) count relation is too large to persist: per
    * group, the exact (additive) total window count plus a DataSketches
    * HLL of the gram fingerprints — CONSTANT bytes per group (~4 KB at
    * lgK=12, ~1.6% rsd; small groups stay in the sketch's exact sparse
    * mode). Mergeable exactly like [[graft.pipeline.Sketches]]' daily
    * sketches: counts add, sketches union. (The union is lossless in
    * ACCURACY but not register-identical to a one-shot sketch — the
    * DataSketches union gadget promotes through HLL_8 and mode
    * transitions differ, so merged and one-shot ESTIMATES can differ
    * sub-percent; the gate bounds both against the exact count.)
    * `n_repeats` estimates as n_grams − estimate;
    * `collision_pairs` needs the exact state ([[ngramDiversityState]]).
    * Output: (grp, n_grams, sketch). */
  def ngramDiversitySketchState(docs: DataFrame, groupCol: String,
      textCol: String, n: Int, lgK: Int = 12): DataFrame =
    gramRelation(docs, groupCol, textCol, n)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_grams"),
        hll_sketch_agg(col("g"), lit(lgK)).as("sketch"))

  /** Merge two [[ngramDiversitySketchState]] relations over
    * DOC-DISJOINT batches: counts add, sketches union. */
  def mergeDiversitySketches(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("grp")
      .agg(sum(col("n_grams")).as("n_grams"),
        hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  /** The diversity report from (merged) sketch state:
    * (groupCol, n_grams, n_distinct_est, n_repeats_est). */
  def ngramDiversityFromSketch(state: DataFrame,
                               groupCol: String): DataFrame =
    state.select(col("grp").as(groupCol), col("n_grams"),
        round(hll_sketch_estimate(col("sketch"))).cast("long")
          .as("n_distinct_est"))
      .withColumn("n_repeats_est", col("n_grams") - col("n_distinct_est"))

  /** The [[ngramDiversity]] report from a (merged) state relation —
    * gated `text_ngram_diversity_incr`: merged-state report ≡ one-shot
    * report row for row. */
  def ngramDiversityFromState(state: DataFrame,
                              groupCol: String): DataFrame =
    state.groupBy(col("grp").as(groupCol)).agg(
      sum(col("c")).cast("long").as("n_grams"),
      count(lit(1)).as("n_distinct"),
      (sum(col("c")) - count(lit(1))).cast("long").as("n_repeats"),
      (sum(col("c").cast("decimal(20,0)") * (col("c") - 1))
        / 2).cast("long").as("collision_pairs"))

  /** Top-k characteristic keywords per document by smoothed TF-IDF:
    * score = tf · ln((N+1)/(df+1)), ranked (score desc, term asc) with a
    * deterministic dense rank. The corpus statistics are ONE vocabulary-
    * sized aggregate (df per term) plus a 1-row count, both broadcast
    * back onto the per-doc term counts; the rank window partitions by
    * doc_id, so its sort is bounded by a document's distinct-term count,
    * never the corpus. Output: (doc_id, rank 1..k, term, score_r4) —
    * the score rounded to 4 decimals for engine-portable display (the
    * ORDER uses the unrounded double).
    *
    * Equal (tf, df) pairs produce bit-identical scores in any IEEE
    * engine, so ties and their term-order resolution are portable. */
  def tfidfKeywords(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = docs
      .select(explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    // df is VOCABULARY-sized: broadcastable for most corpora but not by
    // contract (a web-scale corpus has 10⁸ terms) — no broadcast hint,
    // AQE picks broadcast vs shuffle from the measured size. The 1-row
    // count is always broadcast.
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        log((col("n").cast("double") + lit(1.0)) /
          (col("df").cast("double") + lit(1.0))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
        round(col("score"), 4).as("score_r4"))
  }

  /** Collocation mining by pointwise mutual information: adjacent word
    * pairs that co-occur far more than their marginals predict —
    * PMI = ln(c(ab)·N / (cl(a)·cr(b))) over the corpus bigram table,
    * with cl/cr the left/right marginal counts and N the bigram total.
    * The standard first pass of phrase/vocabulary induction
    * (word2vec-phrases, subword corpora).
    *
    * One bigram explode feeds ONE pair aggregate (vocabulary²-bounded
    * with map-side combine, in practice bigram-type-bounded); the two
    * marginals and the 1-row total derive from THAT aggregate, not from
    * a second corpus scan, and join back at vocabulary size. `minCount`
    * suppresses the unstable low-frequency tail (classic PMI pathology:
    * a pair seen once has maximal PMI). Global top-k by (pmi desc,
    * w1, w2) is a bounded TakeOrderedAndProject, never a full sort.
    * Output: (rank, w1, w2, n_pair, pmi_r4). */
  def collocations(docs: DataFrame, k: Int, minCount: Long = 5L): DataFrame = {
    val pairs = bigramOccurrences(docs)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val left = pairs.groupBy("w1").agg(sum("n_pair").as("n_left"))
    val right = pairs.groupBy("w2").agg(sum("n_pair").as("n_right"))
    val tot = pairs.agg(sum("n_pair").as("n_total"))
    import org.apache.spark.sql.expressions.Window
    pairs.where(col("n_pair") >= minCount)
      .join(left, "w1")
      .join(right, "w2")
      .crossJoin(broadcast(tot))
      .withColumn("pmi",
        log(col("n_pair").cast("double") * col("n_total").cast("double") /
          (col("n_left").cast("double") * col("n_right").cast("double"))))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi").desc, col("w1"), col("w2"))).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("n_pair"),
        round(col("pmi"), 4).as("pmi_r4"))
  }
}
