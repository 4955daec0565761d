package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable byte-pair-encoding vocabulary over the corpus — the real
  * subword tokenizer behind LLM token budgets (Sennrich, Haddow, Birch —
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016), replacing the regex token-count PROXY
  * ([[TextAnalysis.subwordStats]]) with learned merges.
  *
  * Pre-tokenization is Unicode-aware ([[pretokenPattern]]: letter+mark
  * runs, digit runs, single other symbols — the GPT-2-style pre-token
  * shape), not `split(text, ' ')`, so non-ASCII text segments sanely.
  * The pattern uses only Unicode general categories that mean the same
  * thing in Java regex and RE2, so SQL engines reproduce it exactly.
  *
  * TRAINING is the textbook two-phase split that scales to 100 TB:
  *   1. the corpus collapses to a WORD-COUNT table in one distributed
  *      shuffle (vocabulary-sized, not corpus-sized — the only pass
  *      that ever sees the documents);
  *   2. the merge loop runs driver-local over the (capped) word-count
  *      table — the same capped-sample discipline as the k-means fits
  *      (IvfPq.scala): `maxWords` bounds driver memory, and the cap
  *      takes the HIGHEST-count words (bounded top-k, no global sort),
  *      which are the only ones that influence early merges anyway.
  *      Each of the `nMerges` iterations is a pair-count sweep over the
  *      segmented vocabulary — thousands of short words, microseconds —
  *      where a cluster job per iteration would be pure scheduler
  *      overhead.
  *
  * ENCODING is one narrow projection, no UDF, no shuffle: a token's
  * symbol sequence rides as a DOUBLE-SPACE-joined string ("  a  b  "),
  * where applying one merge (l, r) is a plain `replace(s, " l  r ",
  * " lr ")` — the double separator donates one space to each side of
  * the pattern, so a match consumes only its own pair and left-to-right
  * non-overlapping `replace` IS the BPE greedy merge scan (verified
  * against a by-hand reference in BpeSpec, including the "aaaa"
  * overlap case). The whole document encodes as one symbol stream with
  * a  sentinel symbol between tokens — never a training symbol,
  * so merges cannot cross token boundaries — and the `nMerges` chained
  * `replace` calls stay inside whole-stage codegen.
  *
  * The same two representations make the operator ORACLE-EXPRESSIBLE:
  * the driver gate's DuckDB replica trains the identical vocabulary by
  * unrolling the merge loop as generated MATERIALIZED CTE stages and
  * encodes with the identical replace chain (SparkEntry.bpeTrainSql /
  * bpeEncodeSql), so both the learned merges TABLE and the per-document
  * segmentation are hash-compared, not just spec-asserted.
  *
  * Determinism contract: pair-count ties break by (count desc, left,
  * right) with BINARY string order — identical across engines for
  * ASCII; non-ASCII ties could diverge between UTF-16 (Scala) and
  * UTF-8 (DuckDB) orderings, and supplementary-plane characters split
  * into surrogates on the JVM (`split(word, "")`) but code points in
  * DuckDB. Both are outside the driver corpus and documented here
  * rather than guarded.
  */
object Bpe {

  /** Unicode pre-tokenizer classes: letter(+combining-mark) runs, digit
    * runs, single non-space symbols. */
  val pretokenPattern: String = "[\\p{L}\\p{M}]+|\\p{N}+|[^\\p{L}\\p{M}\\p{N}\\s]"

  /** Token-boundary sentinel in the encoded symbol stream. Not produced
    * by [[pretokenPattern]] (it's whitespace-class-free control), so it
    * can never appear inside a learned merge. */
  val boundary: String = "\u0001"

  /** Unicode-aware pre-tokens of a text column. */
  def pretokens(text: Column): Column =
    regexp_extract_all(text, lit(pretokenPattern), lit(0))

  final case class BpeModel(merges: Seq[(String, String)]) {
    def mergesDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      merges.zipWithIndex
        .map { case ((l, r), i) => (i + 1L, l, r) }
        .toDF("rank", "left_sym", "right_sym")
    }
  }

  /** Phase 1: the corpus → word-count table (the only corpus-sized pass;
    * one shuffle on the word). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(pretokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Phase 2: driver-local merge loop over the (capped) word-count
    * table. Stops early if the vocabulary runs out of adjacent pairs.
    * Ties break by (count desc, left, right). */
  def train(wordCounts: DataFrame, nMerges: Int,
            maxWords: Int = 1000000): BpeModel = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val words = wordCounts
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // code-point symbols (matches DuckDB's string_split(word, ''))
    var seg: Array[(Array[String], Long)] = words.map { case (w, c) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seg.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (l, r) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((l, r))
        seg = seg.map { case (syms, cnt) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), cnt)
        }
        k += 1
      }
    }
    BpeModel(merges.result())
  }

  /** One-shot: word counts + train. */
  def fit(docs: DataFrame, textCol: String, nMerges: Int,
          maxWords: Int = 1000000): BpeModel =
    train(wordCounts(docs, textCol), nMerges, maxWords)

  /** The document's encoded symbol STREAM: tokens char-split and
    * double-space-joined, [[boundary]] sentinels between tokens, then
    * every merge applied in rank order as a chained codegen `replace`.
    * Shape: "  s1  s2    s3  ...  " (trim + split on "  " to get
    * the symbols back). */
  def segmented(text: Column, model: BpeModel): Column = {
    val base = concat(lit("  "),
      array_join(
        transform(pretokens(text), t => array_join(split(t, ""), "  ")),
        s"  $boundary  "),
      lit("  "))
    model.merges.foldLeft(base) { case (acc, (l, r)) =>
      replace(acc, lit(s" $l  $r "), lit(s" ${l}${r} "))
    }
  }

  /** Per-document subword stats under the trained vocabulary: REAL
    * token counts (n_subwords excludes the boundary sentinels) plus the
    * full segmentation for downstream packing/chunking. One projection,
    * no shuffle. */
  def encode(docs: DataFrame, textCol: String, idCol: String,
             model: BpeModel): DataFrame = {
    val nToks = size(pretokens(col(textCol)))
    val stream = segmented(col(textCol), model)
    docs.select(
      col(idCol),
      when(nToks === 0, 0L)
        .otherwise((size(split(trim(stream), "  ")) - (nToks - lit(1)))
          .cast("long"))
        .as("n_subwords"),
      stream.as("bpe_text"))
  }
}
