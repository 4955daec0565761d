package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions._

/** A corpus-level LSH candidate-strategy decision — the result of the
  * one-band bucket-histogram probe ([[Dedup.lshStrategyFor]]), carried
  * with the evidence that produced it. `emitOnce` feeds the
  * `emitOnce = Some(...)` pin on [[Dedup.minHashLshPairs]]; the probe
  * stats (`nDocs`, `avgWeightedBucketSize`) make a persisted record
  * auditable (was this decided on the corpus it is being applied to?).
  * Parameters the decision depends on (`numHashes`, `bands`, `oph`)
  * ride along so a mismatched reuse is detectable. */
final case class LshStrategy(emitOnce: Boolean, numHashes: Int,
                             bands: Int, oph: Boolean, nDocs: Long,
                             avgWeightedBucketSize: Double)

/** Deduplication operators for training-data pipelines.
  *
  * Five tiers, cheapest to richest, all over `documents(doc_id, text)`:
  *   1. exact          — md5 content hash, one groupBy
  *   2. jaccardPairs   — EXACT token-set Jaccard via PPJoin-style prefix
  *                       filtering (Xiao et al., WWW'08): only each set's
  *                       rarest-token prefix is indexed, so candidate
  *                       generation shrinks from Σ df² over all tokens to
  *                       Σ df² over prefix tokens, with zero loss —
  *                       any pair at J ≥ t provably shares a prefix token.
  *   3. minHashLsh     — MinHash signatures + banded LSH candidates +
  *                       exact verification (the probabilistic scale path)
  *   4. simHash        — 64-bit SimHash signatures; dup = equal signature,
  *                       near-dup = small Hamming distance via bit-bands
  *   5. embedding near-dup — cosine threshold over embedding vectors
  *
  * Common representation: the HASHED TOKEN SET — sorted distinct
  * xxhash64 of whitespace tokens (array<long>, built by one Kernels call
  * per row). All joins/intersections run on fixed-width longs, never on
  * strings; set intersections are merge-scans over sorted arrays.
  * 64-bit collisions (~V²/2⁶⁴ for vocabulary V) are accepted.
  *
  * Scale notes:
  *  - candidate generation shuffles only (key: long, doc_id: long) pairs;
  *  - verification joins candidates back to hashed sets — at 100 TB this
  *    is a shuffle of compact long-arrays, not documents;
  *  - signatures are fixed-width (numHashes × 8 B ≈ 1 KB/doc).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups: one row per distinct content hash with the
    * smallest doc_id as the canonical keeper. Single hash-groupBy with
    * map-side partial aggregation; the classic first pass at any scale. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Documents to drop under exact dedup (empty when all texts unique). */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .join(exactGroups(docs), "content_hash")
      .where(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), col("keep_id"))

  /** [[graft.functions.PlanShape.dataSizedParts]] for this file's
    * corpus-sized exploded relations (band keys, prefix grams, window
    * hashes — many rows per document). Note from the 10M measurements:
    * the width was decisive for the duplicated-window AGGREGATE
    * (106 → 40 s), while the band JOIN was exchange-bound rather than
    * width-bound — fixed separately by the salt==1 exchange reuse. */
  private def dataSizedParts(df: DataFrame): Int =
    graft.functions.PlanShape.dataSizedParts(df)

  // --------------------------------------------------- hashed token sets

  /** (doc_id, hset: sorted distinct token hashes, sz). Deliberately NOT
    * fanned out (round-14 A/B): the tokenize+hash projection is light
    * relative to shuffling the hset arrays through an extra exchange,
    * and several consumers re-derive this relation per pass — measured
    * net loss (dedup_minhash_lsh 2.1 → 4.1 s) when a fan-out exchange
    * was inserted here. */
  def hashedSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), hashedTokenSet(col("text")).as("hset"))
      .withColumn("sz", size(col("hset")).cast("long"))

  // ------------------------------------- exact Jaccard via prefix filter

  /** Exact token-set Jaccard pairs with jaccard >= thresholdPct/100.
    * Output is integer-only: (a_id, b_id, inter, union_sz); the threshold
    * is `100*inter >= thresholdPct*union` so no float decides membership.
    *
    * Algorithm (PPJoin prefix filter):
    *  - global token order = (document frequency asc, hash asc);
    *  - each set indexes only its first L = |A| − ⌈t·|A|⌉ + 1 tokens
    *    under that order (its rarest tokens);
    *  - J(A,B) ≥ t ⇒ prefixes intersect, so the prefix self-join is a
    *    complete candidate generator;
    *  - candidates are verified with an exact merge-intersection kernel
    *    over the full sorted hash sets.
    */
  def jaccardPairs(docs: DataFrame, thresholdPct: Int): DataFrame =
    collapsedPairs(hashedSets(docs), jaccardPairsOn(_, thresholdPct))

  /** n-gram (w-shingling) Jaccard: identical machinery over hashed
    * n-token shingle sets instead of token sets — the variant that
    * catches reordered/partially-overlapping text that bag-of-tokens
    * similarity overestimates. */
  def jaccardPairsShingled(docs: DataFrame, thresholdPct: Int,
                           n: Int = 3): DataFrame =
    collapsedPairs(
      docs.select(col("doc_id"), hashedShingleSet(col("text"), n).as("hset"))
        .withColumn("sz", size(col("hset")).cast("long"))
        .where(col("sz") > 0),
      jaccardPairsOn(_, thresholdPct))

  private[graft] def jaccardPairsOn(sets: DataFrame,
                                    thresholdPct: Int): DataFrame =
    verifyCandidates(ppjoinCandidates(sets, thresholdPct), sets, thresholdPct)

  /** PPJoin candidate pairs (a_id < b_id, exactly one row per pair) for
    * the exact-Jaccard verification — package-visible so the stage can
    * be profiled apart from verification. */
  private[graft] def ppjoinCandidates(sets: DataFrame,
                                      thresholdPct: Int): DataFrame = {
    val toks = sets.select(col("doc_id"), col("sz"), explode(col("hset")).as("h"))
    val dfreq = toks.groupBy("h").agg(count(lit(1)).as("df"))
    // per-doc PREFIX ARRAY: the L = |A| − ⌈t·|A|⌉ + 1 globally rarest
    // tokens, ordered by (document frequency, hash) — one aggregation,
    // array stays in (df, h) order after the struct sort
    val prefixed = toks.join(dfreq, "h")
      .groupBy(col("doc_id"), col("sz"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ranked"))
      .select(col("doc_id"), col("sz"),
        transform(
          slice(col("ranked"), lit(1),
            (col("sz") - ceilDiv(col("sz") * thresholdPct, 100) + 1).cast("int")),
          s => s.getField("h")).as("prefix"))
    // posexplode keeps each token's POSITION in the global (df, h) order —
    // the PPJoin position filter needs it. The exploded prefix relation is
    // FIXED-WIDTH (doc_id, sz, p, h) — the prefix array itself never rides
    // the exchange (an earlier revision carried it per row for a
    // first-common pair-dedupe scan; at ~0.4·|A| prefix rows each dragging
    // the full ~0.4·|A|-long array, the exchange was quadratic in set size
    // and dominated the whole operator). Repartitioning on the join key
    // `h` both spreads a single-split source across the cluster and is
    // reused by the self-join's exchange (same hash partitioning), so it
    // costs no extra shuffle in the shuffle-join case.
    val prefix = prefixed
      .select(col("doc_id"), col("sz"),
        posexplode(col("prefix")).as(Seq("p", "h")))
      .repartition(dataSizedParts(prefixed), col("h"))
    // Each qualifying pair shares ≥1 prefix token, so the prefix self-join
    // is a complete candidate generator; a pair appearing once per shared
    // prefix token is collapsed by the groupBy — a shuffle of fixed-width
    // candidate rows, which verification re-shuffles anyway. The PPJoin
    // position filter (Xiao et al., WWW'08 §3.2) is complete at the pair's
    // FIRST common token (no earlier token shared ⇒ overlap ≤ 1 +
    // min(remaining in A, remaining in B)); at later common tokens the
    // same bound may spuriously prune or keep individual rows, which is
    // harmless: the first-common row always survives, and spurious
    // survivors only add candidates that exact verification removes.
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id") &&
        sizeCompatible(thresholdPct) &&
        positionCompatible(thresholdPct))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared_prefix"))
      .select("a_id", "b_id")
    cand
  }

  /** ⌈a/b⌉ for positive integer columns. */
  private def ceilDiv(a: Column, b: Int): Column = floor((a + lit(b - 1)) / b)

  /** Length filter: J(A,B) ≥ t implies t·max(|A|,|B|) ≤ min(|A|,|B|),
    * so candidates whose sizes are incompatible are pruned inside the
    * join — integer arithmetic, no true pair ever dropped. */
  private def sizeCompatible(thresholdPct: Int): Column =
    col("x.sz") * 100 >= col("y.sz") * thresholdPct &&
      col("y.sz") * 100 >= col("x.sz") * thresholdPct

  /** PPJoin position filter: at the first shared token, sitting at
    * 0-based positions (x.p, y.p) of the globally-ordered sets, the
    * overlap is at most 1 + min(|A|−x.p−1, |B|−y.p−1); J ≥ t requires
    * overlap ≥ t·(|A|+|B|)/(100+t), so the bound must clear it —
    * all-integer arithmetic, no true pair dropped. */
  private def positionCompatible(thresholdPct: Int): Column =
    (lit(1) + least(col("x.sz") - col("x.p") - 1,
      col("y.sz") - col("y.p") - 1)) * (100 + thresholdPct) >=
      (col("x.sz") + col("y.sz")) * thresholdPct

  /** Exact verification of distinct candidate pairs: join the hashed sets
    * back (sets ≪ candidates, so the planner broadcasts them at test
    * scale and shuffle-joins on doc_id at cluster scale — both linear),
    * merge-count the intersection once per pair, integer threshold.
    * Output: (a_id, b_id, inter, union_sz), no float in any predicate. */
  private[graft] def verifyCandidates(cand: DataFrame, sets: DataFrame,
                               thresholdPct: Int): DataFrame =
    verifyCandidates2(cand, sets, sets, thresholdPct)

  /** [[verifyCandidates]] with per-side set relations (bipartite joins). */
  private def verifyCandidates2(cand: DataFrame, setsA: DataFrame,
                                setsB: DataFrame,
                                thresholdPct: Int): DataFrame =
    cand
      .join(setsA.select(col("doc_id").as("a_id"), col("hset").as("ha"),
        col("sz").as("sa")), "a_id")
      .join(setsB.select(col("doc_id").as("b_id"), col("hset").as("hb"),
        col("sz").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"),
        interSortedSize(col("ha"), col("hb")).as("inter"),
        (col("sa") + col("sb")).as("sz_sum"))
      .withColumn("union_sz", col("sz_sum") - col("inter"))
      .where(col("inter") * 100 >= col("union_sz") * thresholdPct)
      .select("a_id", "b_id", "inter", "union_sz")

  // ----------------------------------------- containment (partial copy)

  /** DIRECTED containment pairs: (a, b) with |A ∩ B| ≥ t·|A| — document
    * a's token set mostly inside b's (quotes, partial copies, documents
    * embedded in larger ones). Jaccard misses these when |B| ≫ |A| (the
    * union term dilutes the overlap); containment is the asymmetric
    * measure built for them.
    *
    * Candidate generation is the one-sided prefix filter: if a's
    * L = |A| − ⌈t·|A|⌉ + 1 rarest tokens (by global document frequency)
    * are ALL absent from B, then |A ∩ B| ≤ |A| − L < t·|A| — so joining
    * a's prefix tokens against b's FULL token relation is complete.
    * Output: (a_id, b_id, inter, a_sz) with a_id ≠ b_id; both directions
    * can appear independently.
    *
    * Scale shape: both join sides are fixed-width rows — (h, doc, sz)
    * only, no set arrays ride the shuffle (unlike the symmetric PPJoin,
    * the b side here would have to carry its FULL set for an in-join
    * emit-once test, which is O(Σ|B|²) shuffle bytes — so candidate
    * dedup is a map-side-combined groupBy over the fixed-width pair
    * multiset instead). Candidate volume is Σ_h df_prefix(h)·df(h) —
    * rare-token-bounded on the prefix side, the same discipline as
    * [[jaccardPairs]]. */
  def containmentPairs(docs: DataFrame, thresholdPct: Int): DataFrame =
    containmentPairsCollapsed(hashedSets(docs), thresholdPct)

  /** [[containmentPairs]] over n-token SHINGLE sets — the partial-copy
    * detector: an embedded quote or copied passage is CONSECUTIVE text,
    * so order-sensitive shingles are the right containment domain
    * (bag-of-tokens containment saturates on corpora with a shared
    * vocabulary — on the test corpus it marks ~90% of all directed pairs
    * at t=0.8, while shingle containment isolates actual copies). */
  def containmentPairsShingled(docs: DataFrame, thresholdPct: Int,
                               n: Int = 3): DataFrame =
    containmentPairsCollapsed(
      docs.select(col("doc_id"), hashedShingleSet(col("text"), n).as("hset"))
        .withColumn("sz", size(col("hset")).cast("long"))
        .where(col("sz") > 0),
      thresholdPct)

  /** Identical-set collapse around [[containmentPairsOn]] (directed
    * expansion — see [[collapsedPairs]] for the undirected analogue). */
  private def containmentPairsCollapsed(sets0: DataFrame,
                                        thresholdPct: Int): DataFrame = {
    val groups = identicalSetGroupsOf(sets0)
    val reps = groups.select(col("rep").as("doc_id"), col("hset"), col("sz"))
    val repPairs = containmentPairsOn(reps, thresholdPct)
    val membership = groups
      .select(col("rep"), explode(col("members")).as("doc_id"), col("sz"))
    // intra-group: identical sets contain each other at 100% — all
    // DIRECTED pairs within a member list (output-sized by definition)
    val m1 = membership.select(col("rep"), col("doc_id").as("a_id"),
      col("sz").as("a_sz"))
    val m2 = membership.select(col("rep"), col("doc_id").as("b_id"))
    val intra = m1.join(m2, "rep").where(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sz").as("inter"), col("a_sz"))
    // cross-group: expand each verified directed rep pair; inter and
    // a_sz carry over exactly (identical sets)
    val cross = repPairs
      .join(membership.select(col("rep").as("a_id"), col("doc_id").as("ma")),
        "a_id")
      .join(membership.select(col("rep").as("b_id"), col("doc_id").as("mb")),
        "b_id")
      .select(col("ma").as("a_id"), col("mb").as("b_id"),
        col("inter"), col("a_sz"))
    intra.unionByName(cross)
  }

  /** The one-sided prefix join + exact verification over a prepared
    * (doc_id, hset, sz) relation — see [[containmentPairs]]. */
  private def containmentPairsOn(sets: DataFrame,
                                 thresholdPct: Int): DataFrame = {
    val toks = sets.select(col("doc_id"), col("sz"), explode(col("hset")).as("h"))
    val dfreq = toks.groupBy("h").agg(count(lit(1)).as("df"))
    val prefixed = toks.join(dfreq, "h")
      .groupBy(col("doc_id"), col("sz"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ranked"))
      .select(col("doc_id"), col("sz"),
        transform(
          slice(col("ranked"), lit(1),
            (col("sz") - ceilDiv(col("sz") * thresholdPct, 100) + 1).cast("int")),
          s => s.getField("h")).as("prefix"))
    val aSide = prefixed
      .select(col("doc_id").as("a_id"), col("sz").as("a_sz"),
        explode(col("prefix")).as("h"))
      .repartition(dataSizedParts(prefixed), col("h"))
    val bSide = toks
      .select(col("doc_id").as("b_id"), col("sz").as("b_sz"), col("h"))
    val cand = aSide.join(bSide, Seq("h"))
      .where(col("a_id") =!= col("b_id") &&
        col("b_sz") * 100 >= col("a_sz") * thresholdPct)
      .groupBy(col("a_id"), col("b_id"))
      .agg(first(col("a_sz")).as("dropme"))
      .select(col("a_id"), col("b_id"))
    cand
      .join(sets.select(col("doc_id").as("a_id"), col("hset").as("ha"),
        col("sz").as("a_sz")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("hset").as("hb")), "b_id")
      .select(col("a_id"), col("b_id"),
        interSortedSize(col("ha"), col("hb")).as("inter"), col("a_sz"))
      .where(col("inter") * 100 >= col("a_sz") * thresholdPct)
  }

  // ------------------------------------------------------------ MinHash

  /** MinHash signature (numHashes longs) per document — one kernel call
    * per row over the hashed token set. `oph = true` (default) uses
    * one-permutation hashing with rotation densification: O(tokens + n)
    * per document instead of O(tokens × n) — the only sane signature
    * cost at 100 TB; the k-hash construction stays available as the
    * statistical reference. */
  def minHashSignatures(docs: DataFrame, numHashes: Int,
                        oph: Boolean = true): DataFrame =
    hashedSets(docs).select(col("doc_id"), sigCol(col("hset"), numHashes, oph))

  private def sigCol(hset: Column, numHashes: Int, oph: Boolean): Column =
    (if (oph) graft.functions.FastFunctions.minhashSigOPH(hset, numHashes)
     else minhashSig(hset, numHashes)).as("sig")

  /** Corpus-dependent candidate-strategy decision for the banded join —
    * the [[graft.query.AnnJoin.recommendedSalt]] pattern applied to LSH:
    * instead of a manual `emitOnce` knob, probe the corpus's own
    * band-bucket histogram and pick the regime it is in (both measured,
    * BENCH_NOTES: dense corpora → emit-once ~3× better; near-unique →
    * fixed-width ~6× better).
    *
    * The probe hashes ONE representative band (an r = numHashes/bands
    * hash signature over the same OPH machinery — band-bucket structure
    * is exchangeable across bands, so one band's histogram stands for
    * all of them at 1/bands of the signature cost) and aggregates Σm and
    * Σm² over its buckets. Emit-once wins when the joined multiset's
    * redundancy (≈ (Σm²−Σm)/2 rows per band, which the fixed-width path
    * must re-aggregate) outweighs the band-array exchange payload it
    * pays (∝ Σm·bands extra longs): avg weighted bucket size Σm²/Σm >
    * 1 + 2·bands/3. One narrow count job (map-side-combined bucket
    * counts), paid only in auto mode; extreme-scale callers pin the
    * strategy explicitly. */
  private[graft] def lshEmitOnceAuto(sets: DataFrame, numHashes: Int,
                                     bands: Int, oph: Boolean): Boolean =
    lshStrategyOn(sets, numHashes, bands, oph).emitOnce

  /** The one-band histogram probe behind [[lshEmitOnceAuto]], returning
    * the full decision record instead of just the bit — the REUSABLE
    * form: at 100 TB, a signature pass per dedup call to re-learn a
    * corpus-level constant is real money, so compute the decision once
    * (this method), persist it beside the corpus
    * ([[saveLshStrategy]] — the IvfPq stats-sidecar pattern), and pin
    * every later call with `emitOnce = Some(strategy.emitOnce)`. */
  private[graft] def lshStrategyOn(sets: DataFrame, numHashes: Int,
                                   bands: Int, oph: Boolean): LshStrategy = {
    val r = math.max(numHashes / bands, 1)
    val agg = sets
      .select(xxhash64(sigCol(col("hset"), r, oph)).as("k"))
      .groupBy("k").agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(col("m")), lit(0L)).as("n"),
        coalesce(sum((col("m") * col("m")).cast("double")), lit(0.0))
          .as("ss"))
      .head()
    val n = agg.getLong(0)
    val avg = if (n > 0) agg.getDouble(1) / n else 0.0
    LshStrategy(
      emitOnce = n > 0 && avg > 1.0 + 2.0 * bands / 3.0,
      numHashes = numHashes, bands = bands, oph = oph,
      nDocs = n, avgWeightedBucketSize = avg)
  }

  /** Probe `docs` once and return the corpus's LSH candidate-strategy
    * decision (see [[lshEmitOnceAuto]] for the regime math). One narrow
    * count job over a single representative band; the result is a
    * corpus-level CONSTANT — persist it with [[saveLshStrategy]] and
    * feed `Some(strategy.emitOnce)` to [[minHashLshPairs]] /
    * [[dropList]]-family calls so no later invocation pays the probe. */
  def lshStrategyFor(docs: DataFrame, numHashes: Int = 128,
                     bands: Int = 32, oph: Boolean = true): LshStrategy = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    lshStrategyOn(hashedSets(docs), numHashes, bands, oph)
  }

  /** Persist an [[LshStrategy]] as a small JSON artifact (+ SHA-256
    * sidecar, the index-manifest integrity discipline) at `path` — e.g.
    * `<corpusDir>/_lsh_strategy.json`. Works on any Hadoop filesystem. */
  def saveLshStrategy(spark: SparkSession, strategy: LshStrategy,
                      path: String): Unit = {
    val json =
      s"""{"emit_once":${strategy.emitOnce},""" +
        s""""num_hashes":${strategy.numHashes},"bands":${strategy.bands},""" +
        s""""oph":${strategy.oph},"n_docs":${strategy.nDocs},""" +
        s""""avg_weighted_bucket_size":${strategy.avgWeightedBucketSize}}"""
    graft.index.IvfPqBuilder.writeString(spark, path, json)
    graft.index.IvfPqBuilder.writeString(spark, path + ".sha256",
      graft.index.IvfPqBuilder.sha256Hex(json))
  }

  /** Load a persisted [[LshStrategy]] (SHA-256-verified when the sidecar
    * exists) — the zero-corpus-pass way to reuse a prior probe. */
  def loadLshStrategy(spark: SparkSession, path: String): LshStrategy = {
    val s = graft.index.IvfPqBuilder.readVerifiedString(spark, path)
    def field(name: String): String =
      (""""""" + name + """"\s*:\s*([^,}]+)""").r.findFirstMatchIn(s)
        .getOrElse(sys.error(s"LshStrategy artifact at $path missing '$name'"))
        .group(1).trim
    LshStrategy(
      emitOnce = field("emit_once").toBoolean,
      numHashes = field("num_hashes").toInt,
      bands = field("bands").toInt,
      oph = field("oph").toBoolean,
      nDocs = field("n_docs").toLong,
      avgWeightedBucketSize = field("avg_weighted_bucket_size").toDouble)
  }

  /** LSH candidate pairs: one 64-bit band key per band (band index salted
    * in), self-join on the key; the firstEqualIdx filter emits each pair
    * from its first shared band only, replacing a distinct() over the
    * (quadratic) candidate multiset. The bands array riding the join is
    * FIXED-width (bands × 8 B), so the in-codegen emit-once scan beats
    * aggregating the joined-row multiset — see [[minHashLshPairs]]. */
  def lshCandidates(signatures: DataFrame, bands: Int): DataFrame = {
    val keyed = signatures
      .select(col("doc_id"), bandKeys(col("sig"), bands).as("bands"))
      .select(col("doc_id"), col("bands"),
        posexplode(col("bands")).as(Seq("b", "k")))
      .repartition(dataSizedParts(signatures), col("k"), col("b"))
    keyed.as("x").join(keyed.as("y"),
        col("x.k") === col("y.k") && col("x.b") === col("y.b") &&
        col("x.doc_id") < col("y.doc_id") &&
        firstEqualIdx(col("x.bands"), col("y.bands")) === col("x.b"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
  }

  /** MinHash+LSH dedup with exact verification: candidates from the band
    * join, then exact token-set Jaccard computed ONLY for candidate pairs.
    * Output = verified pairs at jaccard >= thresholdPct/100 — integer-only
    * like [[jaccardPairs]]. With bands=32, rowsPerBand=4 the probability
    * of missing a pair at j >= 0.9 is (1−j⁴)³² < 2e-15, so the result
    * equals the exact-Jaccard output while scanning candidate pairs only.
    *
    * Shape, designed for the worst case (dense near-dup clusters, where
    * band buckets pair quadratically):
    *  - band-join rows carry (doc_id, sz, bands, b, k) — the bands-long
    *    band-key array rides along (fixed ≈300 B/row, NOT proportional
    *    to set size — unlike the PPJoin prefix array, which is why that
    *    path dropped its array and this one keeps it) but hashed sets do
    *    NOT;
    *  - a pair sharing m bands appears in m joined rows; the
    *    `firstEqualIdx(x.bands, y.bands) = b` filter keeps exactly the
    *    first shared band INSIDE the codegen join loop, so each
    *    candidate survives once with no aggregation over the joined-row
    *    multiset (a groupBy pair-collapse was measured 4-5× slower here:
    *    a J ≥ 0.9 pair matches in ~21 of 32 bands, and hash-aggregating
    *    that multiset costs more than scanning two 32-long arrays per
    *    joined row);
    *  - the length filter prunes size-incompatible pairs inside the join;
    *  - verification joins the surviving pairs back to the hashed sets
    *    and merge-counts each intersection exactly once. */
  /** @param salt split every band bucket into `salt` sub-buckets: the
    *        right side keys by `hash(doc) mod salt`, the left side
    *        replicates each row `salt` times (one per peer sub-bucket),
    *        so a bucket of g docs becomes `salt` tasks of g·g/salt pairs
    *        instead of one g² task. Output is identical for any salt.
    *        Default 4: at local test scale timing is noise-dominated
    *        (A/B measured ±2× run variance either way), but the corpus
    *        has ~10³-doc duplicate clusters — exactly the hot-bucket
    *        regime where one g² task serializes a cluster-scale run —
    *        and the cost (salt× replication of fixed-width band rows)
    *        is linear and small. Raise further when cluster size ≫
    *        executor count × salt. */
  /** @param collapseIdentical collapse docs with IDENTICAL hashed token
    *        sets to one representative before the band join, then expand
    *        the verified pairs back. Identical sets are J=1 — provably
    *        duplicates at any threshold — so the collapse is exact (it
    *        even removes the LSH miss probability for those pairs) while
    *        shrinking the heaviest band buckets QUADRATICALLY: a cluster
    *        of g identical docs costs g²/2 enumerated pairs per shared
    *        band (× all 32 bands) before, one representative after. The
    *        expansion is output-sized. This is the dominant term of the
    *        dense-duplicate corpus regime a dedup pipeline exists for. */
  def minHashLshPairs(docs: DataFrame, thresholdPct: Int,
                      numHashes: Int = 128, bands: Int = 32,
                      salt: Int = 4, oph: Boolean = true,
                      collapseIdentical: Boolean = true,
                      emitOnce: Option[Boolean] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    if (collapseIdentical)
      collapsedPairs(hashedSets(docs),
        minHashLshPairsOn(_, thresholdPct, numHashes, bands, salt, oph,
          emitOnce))
    else
      minHashLshPairsOn(hashedSets(docs), thresholdPct, numHashes, bands,
        salt, oph, emitOnce)
  }

  /** Groups of docs with IDENTICAL hashed sets:
    * (rep = min member id, members sorted, sz, hset). The groupBy key is
    * `xxhash64(hset)` — a FIXED-WIDTH long — so the grouping columns of
    * the collapse exchange are 8-byte keys, not whole hashed-set arrays
    * (at corpus scale the array keys would dominate the exchange). The
    * set itself still rides once per group as an aggregated value (it is
    * the output), and the key is cross-checked in-plan by a SECOND,
    * independently-seeded xxhash64: two distinct sets colliding on the
    * key would have to collide on both hashes (~2⁻¹²⁸) to merge
    * silently; otherwise min ≠ max over the second hash raises. The
    * check buffers are two longs — NOT array copies, which would undo
    * the fixed-width-key saving. Checkpointed — every consumer uses it
    * 2-3 times, and each recomputation would be a corpus scan. */
  private[graft] def identicalSetGroupsOf(sets: DataFrame): DataFrame =
    sets
      .groupBy(xxhash64(col("hset")).as("hkey"))
      .agg(min(col("doc_id")).as("rep"),
        array_sort(collect_list(col("doc_id"))).as("members"),
        first(col("sz")).as("sz"),
        first(col("hset")).as("hset"),
        min(xxhash64(lit(0x9E3779B9L), col("hset"))).as("h2min"),
        max(xxhash64(lit(0x9E3779B9L), col("hset"))).as("h2max"))
      .select(col("rep"), col("members"), col("sz"),
        when(col("h2min") === col("h2max"), col("hset"))
          .otherwise(raise_error(
            lit("xxhash64 collision in identical-set collapse")))
          .as("hset"))
      .localCheckpoint()

  /** Run a pair generator over ONE REPRESENTATIVE per identical set,
    * then expand the verified pairs back — see the collapseIdentical
    * note on [[minHashLshPairs]]: exact at any threshold (identical sets
    * are J=1), with the heaviest candidate buckets shrinking
    * quadratically. Works for any generator whose output depends on the
    * set alone ((a_id, b_id, inter, union_sz) rows). */
  private def collapsedPairs(sets0: DataFrame,
                             pairsOn: DataFrame => DataFrame): DataFrame = {
    val groups = identicalSetGroupsOf(sets0)
    val reps = groups.select(col("rep").as("doc_id"), col("hset"), col("sz"))
    val repPairs = pairsOn(reps)
    val membership = groups
      .select(col("rep"), explode(col("members")).as("doc_id"))
    // intra-group: every (a < b) within a member list, J = 1 exactly
    val intra = groups
      .where(size(col("members")) > 1)
      .select(col("sz"), explode(expr(
        """flatten(transform(sequence(1, size(members) - 1),
          |  i -> transform(slice(members, i + 1, size(members) - i),
          |    b -> struct(element_at(members, i) AS a, b AS b))))"""
          .stripMargin)).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"),
        col("sz").as("inter"), col("sz").as("union_sz"))
    // cross-group: expand each verified rep pair to members × members;
    // inter/union carry over exactly (identical sets)
    val cross = repPairs
      .join(membership.select(col("rep").as("a_id"),
        col("doc_id").as("ma")), "a_id")
      .join(membership.select(col("rep").as("b_id"),
        col("doc_id").as("mb")), "b_id")
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"),
        col("inter"), col("union_sz"))
    intra.unionByName(cross)
  }

  /** The band join + verification over a prepared (doc_id, hset, sz)
    * relation — see [[minHashLshPairs]] for the algorithm notes. */
  private[graft] def minHashLshPairsOn(sets: DataFrame, thresholdPct: Int,
                                numHashes: Int, bands: Int,
                                salt: Int, oph: Boolean,
                                emitOnce: Option[Boolean] = None): DataFrame = {
    // None = auto: derive the strategy from this corpus's own
    // band-bucket histogram (see lshEmitOnceAuto)
    val emit = emitOnce.getOrElse(lshEmitOnceAuto(sets, numHashes, bands, oph))
    verifyCandidates(
      lshBandCandidates(sets, thresholdPct, numHashes, bands, salt, oph,
        emit),
      sets, thresholdPct)
  }

  /** LSH band-join candidate pairs (a_id < b_id, one row per pair) —
    * package-visible so the stage can be profiled apart from
    * verification. */
  private[graft] def lshBandCandidates(sets: DataFrame, thresholdPct: Int,
                                       numHashes: Int, bands: Int,
                                       salt: Int, oph: Boolean,
                                       emitOnce: Boolean = true): DataFrame = {
    // candidate dedup strategy is CORPUS-DEPENDENT, both measured
    // (BENCH_NOTES): emitOnce=true scans the two 32-long band arrays
    // per joined row (firstEqualIdx) and emits each pair exactly once —
    // wins on duplicate-dense corpora, where buckets are huge and the
    // joined multiset (~45x pair redundancy at sf0.1) would crush a
    // hash aggregate, but every band row carries the bands array
    // (~bands x 8 B) through the exchange. emitOnce=false drops the
    // array — fixed-width (doc_id, sz, b, k) rows, ~8x less exchange
    // payload — and collapses the (few) duplicate candidates with a
    // pair groupBy; wins on near-unique corpora where buckets are tiny
    // and the exchange payload is the whole cost (1M-doc probe:
    // ~10 GB/salt-copy of band arrays vs ~1.3 GB fixed-width).
    val exploded0 = sets
      .withColumn("bands",
        bandKeys(sigCol(col("hset"), numHashes, oph), bands))
      .select(col("doc_id"), col("sz"), col("bands"),
        posexplode(col("bands")).as(Seq("b", "k")))
    val exploded = if (emitOnce) exploded0 else exploded0.drop("bands")
    // The ONE exchange discipline, measured three ways at 10M docs
    // (fixed-width path, same candidates from each): the explicit
    // repartition must land on EXACTLY the join's equi-keys at a
    // data-sized width ([[dataSizedParts]]). On the full keys the join
    // plans no further exchange (54 s); leaving the exchange to the
    // join puts it at the session default, whose few wide sort tasks
    // spill (125 s); and repartitioning on a PREFIX of the keys — the
    // previous (k, b) while joining on (k, b, salt) — is the worst of
    // both: EnsureRequirements re-exchanges both sides at the default
    // width anyway, four corpus-sized exchanges in one join (134 s,
    // and 404 s when the salted re-exchange also carries the
    // salt-replicated left side). Hence: salt == 1 joins on (k, b)
    // with NO salt column, salt > 1 derives the salt columns BELOW the
    // exchange so the repartition can include them.
    val w = dataSizedParts(sets)
    val (left, right) =
      if (salt == 1)
        (exploded.repartition(w, col("k"), col("b")),
         exploded.repartition(w, col("k"), col("b")))
      else
        (exploded.withColumn("salt",
            explode(typedlit((0 until salt).map(_.toLong))))
          .repartition(w, col("k"), col("b"), col("salt")),
         exploded.withColumn("salt",
            pmod(xxhash64(col("doc_id")), lit(salt)))
          .repartition(w, col("k"), col("b"), col("salt")))
    // conjunct order matters: the cheap inequality/size predicates run
    // first, the firstEqualIdx scan last — it only ever sees pairs that
    // survived everything else
    val saltEq =
      if (salt == 1) lit(true) else col("x.salt") === col("y.salt")
    val cheap = col("x.k") === col("y.k") && col("x.b") === col("y.b") &&
      saltEq &&
      col("x.doc_id") < col("y.doc_id") &&
      sizeCompatible(thresholdPct)
    if (emitOnce)
      // the emit-once conjunct stays INSIDE the join condition, last:
      // moving it to a post-join filter reorders the predicates and the
      // array scan stops being the guarded final conjunct (measured
      // 2.5x slower on the dense sf0.1 fixture when refactored out)
      left.as("x").join(right.as("y"), cheap &&
          firstEqualIdx(col("x.bands"), col("y.bands")) === col("x.b"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    else
      left.as("x").join(right.as("y"), cheap)
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .groupBy("a_id", "b_id").agg(first(lit(1))).select("a_id", "b_id")
  }

  /** BIPARTITE MinHash+LSH dedup — the incremental-ingest shape: a NEW
    * batch of documents is deduplicated against a (much larger) stored
    * corpus without ever pairing the corpus with itself. Same band
    * geometry, emit-once and salting discipline as [[minHashLshPairs]];
    * the self-join's `a < b` ordering is replaced by the two relations
    * being distinct (ids must not overlap — a shared id would pair a
    * document with itself). A new doc IDENTICAL to a corpus doc shares
    * every band, so exact duplicates are always caught (no miss
    * probability for J=1 pairs beyond the first shared band).
    *
    * Scale shape: the corpus side shuffles once on the band keys —
    * at 100 TB the corpus band relation is the thing you PERSIST
    * (bucketed by (k, b), see graft.sources.BucketedTables) so each
    * daily batch joins against the layout without re-hashing history.
    * Output: (new_id, corpus_id, inter, union_sz) at J ≥ t. */
  def minHashLshPairsBipartite(newDocs: DataFrame, corpusDocs: DataFrame,
                               thresholdPct: Int, numHashes: Int = 128,
                               bands: Int = 32, salt: Int = 4,
                               oph: Boolean = true): DataFrame =
    minHashLshPairsBipartiteOnSets(hashedSets(newDocs),
      hashedSets(corpusDocs), thresholdPct, numHashes, bands, salt, oph)
      .withColumnRenamed("a_id", "new_id")
      .withColumnRenamed("b_id", "corpus_id")

  /** [[minHashLshPairsBipartite]] over prepared (doc_id, hset, sz)
    * relations — lets callers that already hold the hashed sets (e.g.
    * [[incrementalDropList]], which needs the new batch's sets for TWO
    * pair generators) skip re-tokenizing. Output keeps (a_id, b_id)
    * column names. */
  private def minHashLshPairsBipartiteOnSets(
      ls: DataFrame, rs: DataFrame, thresholdPct: Int, numHashes: Int,
      bands: Int, salt: Int, oph: Boolean): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    // same ONE-exchange discipline as [[lshBandCandidates]]: the salt
    // column derives BELOW the exchange so the explicit repartition
    // lands on exactly the join's equi-keys (a prefix-only partitioning
    // would be re-exchanged by EnsureRequirements at the session width)
    def keyed(sets: DataFrame): DataFrame = sets
      .withColumn("bands", bandKeys(sigCol(col("hset"), numHashes, oph), bands))
      .select(col("doc_id"), col("sz"), col("bands"),
        posexplode(col("bands")).as(Seq("b", "k")))
    // ONE shared width for both sides: independent widths would make the
    // two HashPartitionings incompatible and EnsureRequirements would
    // re-exchange a side at join time — exactly the extra corpus-sized
    // shuffle this repartition pair exists to eliminate
    val w = math.max(dataSizedParts(ls), dataSizedParts(rs))
    val left = keyed(ls).withColumn("salt",
        explode(typedlit((0 until salt).map(_.toLong))))
      .repartition(w, col("k"), col("b"), col("salt"))
    val right = keyed(rs).withColumn("salt",
        pmod(xxhash64(col("doc_id")), lit(salt)))
      .repartition(w, col("k"), col("b"), col("salt"))
    val cand = left.as("x").join(right.as("y"),
        col("x.k") === col("y.k") && col("x.b") === col("y.b") &&
        col("x.salt") === col("y.salt") &&
        // ids are documented disjoint across sides, but guard anyway so
        // an overlapping re-ingest can't emit (x, x) self-pairs — and so
        // batch stays identical to StreamingDedup.dedupPairs, which has
        // the same conjunct
        col("x.doc_id") =!= col("y.doc_id") &&
        sizeCompatible(thresholdPct) &&
        firstEqualIdx(col("x.bands"), col("y.bands")) === col("x.b"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    verifyCandidates2(cand, ls, rs, thresholdPct)
  }

  // ------------------------------------------------------------ SimHash

  /** (doc_id, simhash: long) — 64-bit SimHash over the hashed token set. */
  def simHashSignatures(docs: DataFrame): DataFrame =
    hashedSets(docs).select(col("doc_id"), simhash64(col("hset")).as("simhash"))

  /** Pairs with identical SimHash (Hamming distance 0). Equal token sets
    * always collide; unequal-but-similar sets may too — see the verified
    * variant for the exact dup relation. */
  def simHashDupPairs(docs: DataFrame): DataFrame = {
    val sigs = simHashSignatures(docs)
    sigs.as("x").join(sigs.as("y"),
        col("x.simhash") === col("y.simhash") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
  }

  /** [[simHashDupPairs]] verified by exact token-set equality (a join on
    * the fixed-width hashed set — cheap; signatures prune the n² space
    * first). Exactly the set-equal dup relation. */
  def simHashDupPairsVerified(docs: DataFrame): DataFrame = {
    val sets = hashedSets(docs)
    simHashDupPairs(docs)
      .join(sets.select(col("doc_id"), col("hset").as("ha")), col("a_id") === col("doc_id"))
      .drop("doc_id")
      .join(sets.select(col("doc_id"), col("hset").as("hb")), col("b_id") === col("doc_id"))
      .where(col("ha") === col("hb"))
      .select(col("a_id"), col("b_id"))
  }

  /** Near-dup pairs at Hamming distance <= maxHamming over ANY 64-bit
    * signature relation (id, sig), bucketed by 4 16-bit bands
    * (pigeonhole: any pair within Hamming 3 shares at least one exact
    * band — so the output EQUALS the brute-force all-pairs relation).
    * Shuffles only (band, chunk, id).
    *
    * A pair sharing m chunks meets in m joined rows; the
    * `firstEqualIdx(x.chunks, y.chunks) = band` conjunct keeps exactly
    * the first shared chunk — the same emit-once trick as the LSH path,
    * replacing a distinct() shuffle over the quadratic candidate
    * multiset. The Hamming filter runs inside the join condition, before
    * the dedupe, so XOR+bit_count evaluates once per surviving row. */
  def hammingNearPairs(sigs: DataFrame, idCol: String, sigCol: String,
                       maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole covers Hamming <= 3")
    val banded = sigs
      .select(col(idCol).as("id"), col(sigCol).as("sig"),
        array((0 until 4).map(b =>
          shiftright(col(sigCol), b * 16).bitwiseAND(0xFFFFL)): _*)
          .as("chunks"))
      .select(col("id"), col("sig"), col("chunks"),
        posexplode(col("chunks")).as(Seq("band", "chunk")))
      .repartition(dataSizedParts(sigs), col("chunk"), col("band"))
    banded.as("x").join(banded.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.band") === col("y.band") &&
        col("x.id") < col("y.id") &&
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))) <= maxHamming &&
        firstEqualIdx(col("x.chunks"), col("y.chunks")) === col("x.band"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
  }

  /** SimHash near-dup pairs at Hamming <= maxHamming — the banded join
    * of [[hammingNearPairs]] over [[simHashSignatures]]. */
  def simHashNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingNearPairs(simHashSignatures(docs), "doc_id", "simhash", maxHamming)

  // ------------------------------------- span-level (substring) dedup

  /** Span-level exact-substring duplication stats per document (the
    * n-gram-window formulation of Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): a token window of
    * length n is DUPLICATED when the same window string occurs in at
    * least one other document; runs of consecutive duplicated windows
    * merge into maximal duplicated spans (a shared passage of s tokens
    * yields s − n + 1 consecutive windows = one span).
    *
    * Output per document: (doc_id, n_windows, n_dup_windows, n_spans,
    * max_span_tokens) — all integers, zeros for clean docs, where
    * max_span_tokens = longest duplicated passage in tokens
    * (= longest window run + n − 1).
    *
    * Scale shape: windows ride as fixed-width (doc_id, pos, h) rows —
    * the corpus text itself is never shuffled; the duplicated-hash
    * relation aggregates with map-side combine (min/max doc partials);
    * the island window function runs over DUPLICATED windows only
    * (dup-sized, not corpus-sized). */
  def duplicateSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val wins = graft.functions.PlanShape.fanOut(docs)
      .select(col("doc_id"),
        posexplode(shingleHashes(toks, n)).as(Seq("pos", "h")))
    // windows whose string occurs in >= 2 distinct docs (cross-doc
    // duplication; a window repeated only within one doc is repetition,
    // not duplication — TextAnalysis.repetitionSignals covers that)
    val dupH = dupWindowHashes(wins)
    val dup = wins.join(dupH, "h").select("doc_id", "pos")
    // gap-and-island: consecutive duplicated positions share one island
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val spans = dup
      .withColumn("isl", col("pos") - row_number().over(w))
      .groupBy("doc_id", "isl")
      .agg(count(lit(1)).as("len"))
    val perDoc = spans.groupBy("doc_id").agg(
      sum("len").as("dw"),
      count(lit(1)).as("ns"),
      (max("len") + lit(n - 1)).as("mst"))
    docs
      .select(col("doc_id"),
        greatest(size(toks) - lit(n - 1), lit(0)).cast("long").as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("dw"), lit(0L)).as("n_dup_windows"),
        coalesce(col("ns"), lit(0L)).as("n_spans"),
        coalesce(col("mst"), lit(0L)).as("max_span_tokens"))
  }

  /** Exact verbatim-overlap pairs by WINNOWED fingerprints (Schleimer–
    * Wilkerson–Aiken, SIGMOD'03 — the MOSS fingerprinting scheme): each
    * document contributes only the winnowing-selected ~2/(w+1) fraction
    * of its n-gram hashes (one kernel call per row, see
    * [[graft.functions.Kernels.winnowedFingerprints]]), candidates are
    * the pairs sharing a selected fingerprint, and every candidate is
    * VERIFIED against the exact overlap measure: the number of distinct
    * shared (n+w−1)-token windows, computed by a sorted-set merge-scan
    * over each doc's L-gram hash set.
    *
    * The winnowing guarantee makes this candidate-COMPLETE for the
    * verified measure: any pair sharing an L = n+w−1-token substring
    * shares a full w-window of identical gram hashes, whose minimum
    * value both documents select. So the output equals "all pairs
    * sharing ≥1 exact L-token window" (mod 64-bit hash collisions) —
    * hash-order-independent, hence SQL-oracle-able — while candidate
    * generation touches a (w+1)/2-fold smaller relation than emitting
    * every window ([[duplicateSpans]] does, for its per-doc span
    * accounting; THIS is the pairwise path you run at corpus scale).
    *
    * Scale shape: fingerprinting is per-row (no shuffle); the
    * fingerprint self-join buckets on the 64-bit fingerprint exactly
    * like the LSH band join; verification joins each doc's L-gram set
    * once per surviving candidate side. Ubiquitous fingerprints
    * (boilerplate) can be capped with `maxDf` — that trades the
    * completeness guarantee for bounded bucket skew, the same knob the
    * LSH path exposes; the default keeps the guarantee.
    *
    * Output: (a_id, b_id, n_shared_windows > 0), a_id < b_id. */
  def winnowedPairs(docs: DataFrame, n: Int = 4, w: Int = 5,
                    maxDf: Option[Int] = None): DataFrame = {
    val L = n + w - 1
    val fp = docs.select(col("doc_id"),
      explode(winnowedFingerprints(split(col("text"), " "), n, w)).as("fp"))
    // the fingerprint relation exchanges ONCE, on exactly the self-
    // join's equi-key at a data-sized width (the r9 exchange
    // discipline); the optional hot-cap aggregate and both join sides
    // are served by the same partitioning
    val fp1 = fp.repartition(dataSizedParts(fp), col("fp"))
    val fpKept = maxDf match {
      case Some(cap) =>
        val hot = fp1.groupBy("fp").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("fp")
        fp1.join(hot, Seq("fp"), "left_anti")
      case None => fp1
    }
    val cand = fpKept.as("a")
      .join(fpKept.as("b"), col("a.fp") === col("b.fp") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val lsets =
      docs.select(col("doc_id"), hashedShingleSet(col("text"), L).as("ls"))
    cand
      .join(lsets.select(col("doc_id").as("a_id"), col("ls").as("la")), "a_id")
      .join(lsets.select(col("doc_id").as("b_id"), col("ls").as("lb")), "b_id")
      .select(col("a_id"), col("b_id"),
        interSortedSize(col("la"), col("lb")).cast("long")
          .as("n_shared_windows"))
      .where(col("n_shared_windows") > 0)
  }

  /** Ingest-time variant of [[winnowedPairs]]: verbatim-overlap pairs
    * between NEW documents and an existing corpus only — new×corpus,
    * never corpus×corpus, the same incremental contract as
    * [[minHashLshPairsBipartite]] and the other `*Incremental`
    * operators. The corpus fingerprint relation is a pure projection of
    * the corpus (persist it once, reuse every batch); each ingest batch
    * fingerprints only its own rows. Same guarantee and verified output
    * measure as the symmetric path. */
  def winnowedPairsBipartite(newDocs: DataFrame, corpus: DataFrame,
                             n: Int = 4, w: Int = 5,
                             maxDf: Option[Int] = None): DataFrame =
    winnowedPairsAgainst(newDocs,
      winnowedCorpusFingerprints(corpus, n, w, maxDf),
      winnowedCorpusWindows(corpus, n, w), n, w)

  /** The corpus fingerprint relation (corpus_id, fp) the ingest-time
    * winnowing joins against, with the `maxDf` boilerplate cap already
    * applied — a pure projection of the corpus; persist it once and
    * reuse it every batch ([[winnowedPairsAgainst]],
    * [[graft.streaming.StreamingWinnow]]). */
  def winnowedCorpusFingerprints(corpus: DataFrame, n: Int = 4, w: Int = 5,
                                 maxDf: Option[Int] = None): DataFrame = {
    val all = corpus.select(col("doc_id").as("corpus_id"),
      explode(winnowedFingerprints(split(col("text"), " "), n, w)).as("fp"))
    maxDf match {
      case Some(cap) =>
        val hot = all.groupBy("fp").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("fp")
        all.join(hot, Seq("fp"), "left_anti")
      case None => all
    }
  }

  /** The corpus verification relation (corpus_id, ls): each doc's
    * sorted hashed L-window set (L = n + w − 1), the exact-merge side
    * of the shared-window measure. Persistable like the fingerprints. */
  def winnowedCorpusWindows(corpus: DataFrame, n: Int = 4,
                            w: Int = 5): DataFrame =
    corpus.select(col("doc_id").as("corpus_id"),
      hashedShingleSet(col("text"), n + w - 1).as("ls"))

  /** One ingest batch against PREPARED corpus relations — the
    * per-trigger body of [[graft.streaming.StreamingWinnow]], identical
    * to [[winnowedPairsBipartite]] for that batch's rows. */
  def winnowedPairsAgainst(newDocs: DataFrame, corpusFps: DataFrame,
                           corpusWindows: DataFrame,
                           n: Int = 4, w: Int = 5): DataFrame = {
    val L = n + w - 1
    val cand = newDocs.select(col("doc_id").as("new_id"),
        explode(winnowedFingerprints(split(col("text"), " "), n, w)).as("fp"))
      .join(corpusFps, "fp")
      .select("new_id", "corpus_id").distinct()
    cand
      .join(newDocs.select(col("doc_id").as("new_id"),
        hashedShingleSet(col("text"), L).as("la")), "new_id")
      .join(corpusWindows.withColumnRenamed("ls", "lb"), "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        interSortedSize(col("la"), col("lb")).cast("long")
          .as("n_shared_windows"))
      .where(col("n_shared_windows") > 0)
  }

  /** The cross-document duplicated-window-hash relation shared by
    * [[duplicateSpans]] and [[removeDuplicateSpans]]: hashes whose
    * window string occurs in ≥ 2 distinct documents, MATERIALIZED
    * (localCheckpoint — the aggregate runs once, not once per
    * consumer), counted, and broadcast when the measured size allows.
    *
    * The aggregate groups ~|tokens| mostly-singleton keys; at the
    * session's default reducer count each final hash map holds
    * groups/P entries and spills past executor memory (measured at
    * 10M docs / 430M windows: 32 reducers spill and cost 106 s; 256
    * reducers fit and cost 40 s). The explicit repartition on h
    * widens the aggregation to 4 reducers per input split — sized to
    * the data, not the session default — and doubles as the exchange
    * the groupBy needs anyway, so no extra shuffle is introduced. */
  private def dupWindowHashes(wins: DataFrame): DataFrame = {
    val dupH = wins.repartition(dataSizedParts(wins), col("h"))
      .groupBy("h")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .where(col("mn") < col("mx"))
      .select("h")
      .localCheckpoint()
    // ≤ 20M distinct duplicated hashes (~160 MB of longs) broadcast;
    // an adversarially duplicated corpus falls back to the hash join
    if (dupH.count() <= 20000000L) broadcast(dupH) else dupH
  }

  /** Span-level substring REMOVAL — the transform [[duplicateSpans]]
    * only measures (Lee et al. 2022's ExactSubstr-style dedup, the
    * n-gram-window formulation): every token covered by a cross-document
    * duplicated n-token window is cut from every copy, and the document
    * is reassembled from its surviving tokens. Symmetric removal (all
    * copies lose the span) — deterministic with no keep-one ordering
    * choice; compose with [[winnowedPairs]]/keepBest upstream when one
    * canonical copy should survive.
    *
    * Scale shape: the corpus tokenizes twice (both passes project the
    * fixed-width (h, doc_id, pos) window relation) but SHUFFLES at most
    * once. Materializing the window relation instead was tried and
    * REJECTED both ways at 10M docs: a window over the hash partition
    * forces a full sort (157 → 217 s), and localCheckpointing the
    * exploded relation writes ~10 GB of blocks to dodge a cheap codegen
    * projection (157 → 400 s) — recompute wins. What IS persisted is
    * the small side ([[dupWindowHashes]]): the duplicated-hash set is
    * materialized once with a data-sized aggregation width, counted,
    * and the join strategy chosen from that MEASURED size (the
    * lshStrategyFor discipline) — below the broadcast bound the
    * covered-position pass is shuffle-free, so the only shuffle in the
    * whole job is the dup-hash aggregate's. The per-doc drop set is
    * doc-length-bounded; the strip is one positional higher-order
    * filter projection; untouched documents pass through VERBATIM (no
    * retokenization). 10M-doc probe: 157 s (r8) → 96 s.
    *
    * `broadcastMaxRows`/`broadcastMaxElems` cap the measured drop-side
    * broadcast (defaults ≈ 1 GB relation — see [[measuredDropSide]]);
    * lower them on memory-constrained deployments. */
  def removeDuplicateSpans(docs: DataFrame, n: Int = 8,
                           broadcastMaxRows: Long = 10000000L,
                           broadcastMaxElems: Long = 100000000L)
      : DataFrame = {
    val toks = split(col("text"), " ")
    val wins = docs.select(col("doc_id"),
      posexplode(shingleHashes(toks, n)).as(Seq("pos", "h")))
    val dupSide = dupWindowHashes(wins)
    val covered = wins.join(dupSide, "h")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("idx"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set("idx")).as("drop_idx"))
    docs.join(measuredDropSide(covered, "drop_idx",
        broadcastMaxRows, broadcastMaxElems), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("drop_idx").isNull, col("text"))
          .otherwise(stripTokenIndexes(toks, col("drop_idx")))
          .as("clean_text"),
        when(col("drop_idx").isNull, lit(0))  // size(NULL) is -1 pre-ANSI
          .otherwise(size(col("drop_idx"))).cast("long")
          .as("n_tokens_removed"))
  }

  /** Join-side strategy for a derived (id, drop-index-array) relation
    * joining back onto a corpus-sized text relation — shared by
    * [[removeDuplicateSpans]] and
    * [[graft.pipeline.TrainingData.removeContaminatedSpans]]. The drop
    * side is an aggregate Catalyst cannot size, so unaided planning
    * sort-merges — SORTING (and at scale spilling) the corpus side
    * (the 100M removeContaminatedSpans probe read 674 s → 530 s fixed).
    * Strategy is MEASURED, and — unlike the fixed-width benchGramSet
    * gate — measured in ELEMENTS, not rows: the arrays are variable
    * width, and 10M rows of 1000-index arrays would blow the 8 GB
    * broadcast hard limit a row gate would wave through. Broadcast
    * only when rows ≤ 10M AND total indexes ≤ 100M (≈ 1 GB hash map);
    * otherwise shuffle-hash (build on the drop side — no corpus sort
    * either way). The materialize + count makes the CALL eager (two
    * Spark jobs over the fingerprint pipeline at plan-construction
    * time) — the documented price of measured strategy, same as
    * decontaminate's gram set.
    *
    * Ceilings are CONFIGURABLE (`maxRows`/`maxElems`, defaults 10M rows
    * / 100M elements ≈ 1 GB hash relation): the default admits a
    * broadcast that is replicated to the driver and every executor —
    * fine on the deployments this repo benches (24 GB+ driver), but a
    * memory-constrained cluster should lower them (they are plumbed
    * through the public span-removal operators) rather than patch the
    * operator. Both bounds must be positive. */
  private[pipeline] def measuredDropSide(side: DataFrame,
                                         arrCol: String,
                                         maxRows: Long = 10000000L,
                                         maxElems: Long = 100000000L)
      : DataFrame = {
    require(maxRows > 0 && maxElems > 0,
      s"broadcast ceilings must be positive, got rows=$maxRows elems=$maxElems")
    val m = side.localCheckpoint()
    val r = m.agg(count(lit(1)), sum(size(col(arrCol)))).head()
    val rows = r.getLong(0)
    val elems = if (r.isNullAt(1)) 0L else r.getLong(1)
    if (rows <= maxRows && elems <= maxElems) broadcast(m)
    else m.hint("shuffle_hash")
  }

  /** Reassemble a token array with the SORTED distinct 0-based indexes
    * `dropIdx` removed, in O(tokens + drops) work per doc: the kept
    * tokens are exactly the GAPS between consecutive dropped indexes
    * (head and tail included), each cut as one `slice` — the previous
    * per-token `array_contains` membership filter was
    * O(tokens × drops), quadratic for a heavily-covered long document.
    * Output order and content are identical to the filter form. */
  private[pipeline] def stripTokenIndexes(toks: Column,
                                          dropIdx: Column): Column = {
    val lo = concat(array(lit(-1)), dropIdx)
    val hi = concat(dropIdx, array(size(toks)))
    array_join(flatten(zip_with(lo, hi,
      (a, b) => slice(toks, a + lit(2), b - a - lit(1)))), " ")
  }

  // -------------------------------------------- clusters and drop lists

  /** Connected components of the undirected pair graph by alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14 — a public algorithm):
    * each phase rewrites every edge toward the minimum of a node's
    * neighborhood, so the edge set CONTRACTS toward one star per
    * component in O(log² n) phases. Dense near-dup graphs (a cluster of
    * g docs verifies ~g²/2 pairs) collapse to g−1 star edges after the
    * first cycle — the at-scale property that matters: a min-label
    * propagation loop re-joins the full pair multiset every round, while
    * this touches ~|V| edges per cycle after the first.
    *
    * Skew-safe: no neighbor-list aggregation — each phase is a
    * groupBy-min (one row per node) joined back to the edge list, so a
    * node with millions of duplicates never materializes its
    * neighborhood in one task.
    *
    * Edges are kept canonical (hi > lo). Returns (doc_id, component)
    * with component = min reachable doc_id. */
  /** @param localCutoff once the (contracted) edge set has at most this
    *        many edges, collect it and finish with a driver-local
    *        union-find — ≤ cutoff×16 B, the same driver-residency budget
    *        as k-means training samples. Distributed contraction cycles
    *        run only while the graph is genuinely large; without the
    *        endgame, every tail cycle costs ~6 scheduler-bound shuffles
    *        to move a few thousand rows (measured: 4 cycles × ~1.5 s at
    *        sf0.1 for a graph that collapsed to 3k edges after cycle 1). */
  def connectedComponents(ids: DataFrame, pairs: DataFrame,
                          maxIter: Int = 25,
                          localCutoff: Long = 1L << 20): DataFrame = {
    // localCheckpoint truncates lineage each phase — iterated self-
    // dependent plans otherwise blow up Catalyst analysis exponentially.
    // No pre-distinct: every generator in this file emits each pair once
    // (the firstEqualIdx/firstCommon tricks), the local union-find is
    // duplicate-insensitive, and the contraction cycles dedupe per phase
    // anyway — a defensive distinct here is a full shuffle of the pair
    // set for nothing.
    var e = pairs.select(
        greatest(col("a_id"), col("b_id")).as("hi"),
        least(col("a_id"), col("b_id")).as("lo"))
      .where(col("hi") =!= col("lo"))
      .localCheckpoint()
    var (cnt, sig) = edgeSig(e)
    var stable = false
    var i = 0
    while (!stable && cnt > localCutoff && i < maxIter) {
      // large-star: for every node u, neighbors v > u re-point to
      // m = min(Γ(u) ∪ {u}); keeps (v, m) canonical since v > u ≥ m
      val e2 = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v"))) // u's full Γ
      val mins2 = e2.groupBy("u").agg(min("v").as("mv"))
      val large = e2.join(mins2, "u").where(col("v") > col("u"))
        .select(col("v").as("hi"), least(col("u"), col("mv")).as("lo"))
        .distinct()
      // small-star: neighbors of u are all < u here; every v ∈ Γ(u)∪{u}
      // except the min m re-points to m
      val mins1 = large.groupBy("hi").agg(min("lo").as("m"))
      val small = large.join(mins1, "hi").where(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .unionByName(mins1.select(col("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint()
      // fixpoint ⇔ the edge multiset is unchanged by a full cycle;
      // (count, Σ hash) equality is the cheap stand-in for set equality
      // (64-bit sum — a false positive needs an exact hash-sum collision)
      val (ncnt, nsig) = edgeSig(small)
      stable = ncnt == cnt && nsig == sig
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] cycle $i edges=$ncnt stable=$stable")
      cnt = ncnt; sig = nsig
      e = small
      i += 1
    }
    // endgame: the contracted graph fits on the driver — finish with an
    // exact union-find (min-id roots), skipping the remaining contraction
    // cycles whose shuffles would each move a few thousand rows. Falls
    // through to the distributed star extraction only on maxIter exits
    // with a still-large graph.
    val stars =
      if (cnt <= localCutoff) {
        val spark = ids.sparkSession
        import spark.implicits._
        localUnionFind(e.select("hi", "lo").as[(Long, Long)].collect())
          .toSeq.toDF("doc_id", "root")
      } else {
        // at the fixpoint e is one star per component, rooted at its min
        // id (Kiveris et al. §3); groupBy-min covers maxIter exits
        e.groupBy(col("hi").as("doc_id")).agg(min("lo").as("root"))
      }
    ids.select(col("doc_id")).join(stars, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("comp"))
  }

  /** Exact driver-local union-find with path compression; returns
    * (node → min id of its component) for every non-root node touched by
    * an edge — the same (doc_id, root) relation the star fixpoint emits. */
  private def localUnionFind(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) { // union under MIN root keeps roots = component minima
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val out = Map.newBuilder[Long, Long]
    parent.keys.foreach { n =>
      val r = find(n)
      if (r != n) out += n -> r
    }
    out.result()
  }

  /** (count, Σ xxhash64(hi, lo)) of an edge set — the O(1)-state
    * convergence signature for [[connectedComponents]]. */
  private def edgeSig(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), sum(xxhash64(col("hi"), col("lo")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** The dedup deliverable: which documents to DROP, keeping the min-id
    * document of every near-duplicate cluster (cluster = connected
    * component of the verified pair graph at jaccard ≥ thresholdPct/100).
    * Output: (drop_id, keep_id), empty when the corpus is clean.
    *
    * Pair generation is THRESHOLD-ADAPTIVE: at t ≥ 0.8 the exact PPJoin
    * prefix filter (prefix length ≈ (1−t)·|A| + 1 — short, and the
    * candidate set is deterministically complete) measured ~2× cheaper
    * than banded MinHash at near-certain capture (sf0.1, 3935 reps:
    * 1.7M prefix candidates / 2.5 s end-to-end vs 2.2M band candidates
    * / 5 s, same 28.9k verified pairs); at lower thresholds prefixes
    * approach the whole set and the banded-LSH path wins. Both are
    * bucketed generators (prefix-token vs band buckets) — never
    * all-pairs — and both feed the same exact verification, so a pair
    * either path EMITS is verified identically; but the generators are
    * not equivalent: the PPJoin prefix path is deterministically
    * complete, while banded MinHash is probabilistic (capture
    * 1−(1−t^r)^b < 1), so at t ≥ 80 the prefix path can legitimately
    * find pairs LSH would miss. Do not gate on bit-identical drop
    * lists across threshold settings. */
  /** @param emitOnce pin for the t < 80 banded path's candidate
    *        strategy (see [[lshStrategyFor]]) — `None` probes the
    *        corpus per call; recurring pipelines pass
    *        `Some(strategy.emitOnce)` from a persisted decision. */
  def dropList(docs: DataFrame, thresholdPct: Int,
               emitOnce: Option[Boolean] = None): DataFrame = {
    // connectivity needs rep-level verified pairs + member→rep STAR
    // edges, not the expanded pair relation: a g-doc identical cluster
    // contributes g−1 linear edges here vs g²/2 expanded pairs, and the
    // components (and their minima — every member reaches its group,
    // every group its verified neighbors) are the same
    val groups = identicalSetGroupsOf(hashedSets(docs))
    val reps = groups.select(col("rep").as("doc_id"), col("hset"), col("sz"))
    val repPairs = (if (thresholdPct >= 80) jaccardPairsOn(reps, thresholdPct)
      else minHashLshPairsOn(reps, thresholdPct,
        numHashes = 128, bands = 32, salt = 4, oph = true, emitOnce))
      .select("a_id", "b_id")
    val starEdges = groups.where(size(col("members")) > 1)
      .select(col("rep").as("a_id"), explode(col("members")).as("b_id"))
      .where(col("a_id") =!= col("b_id"))
    connectedComponents(docs.select(col("doc_id")),
        repPairs.unionByName(starEdges))
      .where(col("doc_id") =!= col("comp"))
      .select(col("doc_id").as("drop_id"), col("comp").as("keep_id"))
  }

  /** BEST-of-cluster dedup decision: for every near-dup component keep
    * the highest-SCORING member (ties toward the smaller id) instead of
    * the smallest id — "of these near-duplicates, keep the longest /
    * highest-quality copy", which is what a training pipeline actually
    * wants when duplicates differ in truncation or cleanliness. Same
    * component machinery as [[dropList]]'s decision layer (near-dup is
    * not transitive; the closure is the pairwise-clean boundary); the
    * ranking window partitions by component, so its sort is bounded by
    * the component size, never the corpus. `scored` carries
    * (doc_id, `scoreCol`); output adds (comp, keep ∈ {0,1}), exactly one
    * keep = 1 per component. */
  def keepBest(scored: DataFrame, scoreCol: String,
               pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(scored.select(col("doc_id")), pairs)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("comp")
      .orderBy(col(scoreCol).desc, col("doc_id"))
    scored.join(comp, "doc_id")
      .withColumn("keep",
        when(row_number().over(w) === 1, 1L).otherwise(0L))
      .select(col("doc_id"), col("comp"), col(scoreCol), col("keep"))
  }

  /** Incremental drop list — the ingest decision layered on
    * [[minHashLshPairsBipartite]]: which NEW documents to drop, given a
    * protected stored corpus (corpus docs are never dropped). A new doc
    * drops when its near-dup component (over bipartite new↔corpus pairs
    * ∪ new↔new pairs at J ≥ t) contains a corpus doc (keep = min corpus
    * member) or a smaller surviving new doc (keep = component minimum).
    * Output: (drop_id, keep_id) over new docs only. Ids must be disjoint
    * across sides. */
  /** @param emitOnce pin for the new×new banded path (the bipartite
    *        new×corpus join has a fixed strategy) — same reuse contract
    *        as [[dropList]]. */
  def incrementalDropList(newDocs: DataFrame, corpusDocs: DataFrame,
                          thresholdPct: Int,
                          emitOnce: Option[Boolean] = None): DataFrame = {
    // ONE tokenize+hash pass over the new batch: its hashed-set relation
    // is materialized once (localCheckpoint) and threaded through BOTH
    // pair generators — the bipartite new↔corpus band join and the
    // collapsed new↔new self-join each previously re-derived it from
    // text, paying a second full tokenization of every new document
    val newSets = hashedSets(newDocs).localCheckpoint()
    val bi = minHashLshPairsBipartiteOnSets(newSets, hashedSets(corpusDocs),
        thresholdPct, numHashes = 128, bands = 32, salt = 4, oph = true)
      .select("a_id", "b_id")
    val nn = collapsedPairs(newSets,
        minHashLshPairsOn(_, thresholdPct, numHashes = 128, bands = 32,
          salt = 4, oph = true, emitOnce))
      .select("a_id", "b_id")
    val allIds = newDocs.select(col("doc_id"))
      .unionByName(corpusDocs.select(col("doc_id")))
    val comps = connectedComponents(allIds, bi.unionByName(nn))
    val corpusMin = comps
      .join(corpusDocs.select(col("doc_id")), "doc_id")
      .groupBy("comp").agg(min(col("doc_id")).as("min_corpus"))
    comps
      .join(newDocs.select(col("doc_id")), "doc_id")
      .join(corpusMin, Seq("comp"), "left")
      .withColumn("keep_id", coalesce(col("min_corpus"), col("comp")))
      .where(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id").as("drop_id"), col("keep_id"))
  }

  // ------------------------------------------- embedding near-duplicates

  /** Near-duplicate pairs by embedding cosine similarity above
    * thresholdMilli/1000. Brute-force all-pairs — the CAPPED correctness
    * baseline and recall oracle, never the corpus-scale path: an
    * unguarded cartesian is a scale-killer, so the operator refuses
    * inputs above `maxRows` instead of silently launching an O(n²)
    * job. The guard costs one count() job per call; callers that
    * already know the size pass `knownRows` (>= 0) to skip it, and
    * `maxRows = Long.MaxValue` skips the guard entirely (keeping the
    * plan lazy) and means "I accept the cartesian". The 100 TB path is
    * [[graft.query.AnnJoin.cosineSelfJoin]] — IVF-bucketed candidates,
    * exact-cosine verified, same output contract. Output ids only
    * (cosine values are order-stable but not bit-stable across
    * engines). */
  def embeddingNearDupPairs(embeddings: DataFrame, thresholdMilli: Int,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            maxRows: Long = 100000L,
                            knownRows: Long = -1L): DataFrame = {
    if (maxRows < Long.MaxValue) {
      val n = if (knownRows >= 0L) knownRows else embeddings.count()
      require(n <= maxRows,
        s"embeddingNearDupPairs is the all-pairs BASELINE, capped at " +
          s"$maxRows rows (got $n) — use AnnJoin.cosineSelfJoin for the " +
          s"IVF-bucketed scale path, or raise maxRows explicitly")
    }
    val e0 = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
    // the nested-loop join's parallelism follows the stream side's
    // partitioning — never inherit a single-split source layout. Width
    // pinned EXPLICITLY: a keyed repartition without a width is subject
    // to AQE partition coalescing, which squeezed the O(n²) cosine loop
    // onto two tasks of a 32-core box (round-15 profile)
    val e = e0.repartition(graft.functions.PlanShape.dataSizedParts(e0),
      col("id"))
    e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        cosineF(col("x.v"), col("y.v")).as("cos"))
      .where(col("cos") * 1000 >= thresholdMilli)
      .select(col("a_id"), col("b_id"))
  }

  /** SemDeDup-style decision layer (Abbas et al. 2023,
    * arXiv:2303.09540): which documents to DROP given embedding
    * near-duplicate pairs — keep the smallest id of every semantic
    * cluster (cluster = connected component of the pair graph, the same
    * closure [[dropList]] takes over token-Jaccard pairs: cosine
    * near-duplication is not transitive, so without the component
    * closure two keepers could themselves be near-dups through a
    * middleman). `pairs` is any (a_id, b_id) near-dup relation — the
    * capped exact baseline ([[embeddingNearDupPairs]]) for oracle runs,
    * [[graft.query.AnnJoin.cosineSelfJoin]] at corpus scale; `ids` is
    * the full (doc_id) universe so singletons survive. Output:
    * (drop_id, keep_id), empty when no near-dup pairs exist. */
  def embeddingDropList(ids: DataFrame, pairs: DataFrame): DataFrame =
    connectedComponents(ids, pairs.select(col("a_id"), col("b_id")))
      .where(col("doc_id") =!= col("comp"))
      .select(col("doc_id").as("drop_id"), col("comp").as("keep_id"))

  /** FULL SemDeDup keep policy (Abbas et al. 2023, arXiv:2303.09540
    * §3): within each semantic cell, every near-dup component keeps the
    * member FARTHEST from the cell centroid — the paper's
    * low-similarity-to-centroid rule (the most atypical copy carries
    * the most marginal information; [[embeddingDropList]]'s min-id rule
    * is the policy-free variant) — ties toward the smaller id.
    *
    * The farness score is INTEGER-EXACT and engine-portable: with
    * xm = ⌊1000·x⌋ per coordinate (the
    * [[graft.pipeline.Embeddings.centroidSumsMilli]] quantization) and
    * (n, S_i) the cell's member count and coordinate sums, a member
    * scores Σ_i (n·xm_i − S_i)² — n² times its squared L2 distance to
    * the quantized cell MEAN, computed in decimal(38,0) (n ≤ 1e12
    * members and |xm| ≤ 2e3 keep the sum under 1e33), so the same
    * member wins in any engine: no float argmax, no rotation-order
    * drift.
    *
    * Scale shape: the (n, S) statistics are a (cell, pos)-keyed
    * aggregate — corpus × dim rows INTO it but map-side combined, only
    * cell-count × dim (metadata-sized) out — pivoted to one
    * sum-vector array per cell and joined back under the MEASURED
    * strategy (broadcast below the element ceiling, shuffle-hash built
    * on the cell side past it — paper-scale 100k cells × 1536 dims is
    * ~1 GB, too big to replicate blindly), so the per-member
    * score is a single narrow zip_with/aggregate projection: the
    * corpus itself is never exploded through a shuffle and never
    * re-keyed. The only window is [[keepBest]]'s, bounded by the
    * component, never the corpus. `pairs` must already be scoped to
    * equal-`groupCol` (the paper's within-cluster scoping — it is what
    * bounds the quadratic), so components never span cells; cells come
    * from k-means ([[graft.pipeline.Clustering.assign]]) in production
    * and any deterministic cell key in oracles. Output:
    * (doc_id, comp, keep ∈ {0,1}) — exactly one keep per component,
    * singletons keep themselves. */
  def semDeDup(embeddings: DataFrame, idCol: String, vecCol: String,
               groupCol: String, pairs: DataFrame): DataFrame = {
    val milli = (x: Column) => floor(x.cast("double") * 1000).cast("long")
    // per-position member counts are non-increasing in pos and uniform
    // IFF every member of the cell has the same vector width — so
    // min(n) == max(n) is exactly the "no ragged vectors" invariant.
    // Enforced loudly: a ragged cell would otherwise null-pad through
    // zip_with and crown an arbitrary keeper (and diverge from the SQL
    // oracle, which uses per-position n).
    val cellS = embeddings.select(col(groupCol).as("__g"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("__g"), col("pos"))
      .agg(sum(milli(col("x"))).as("s"), count(lit(1)).as("n"))
      .groupBy(col("__g"))
      .agg(min(col("n")).as("n_min"), max(col("n")).as("n_max"),
        transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          e => e.getField("s")).as("sv"))
      .select(col("__g"),
        when(col("n_min") === col("n_max"), col("n_max"))
          .otherwise(raise_error(concat(
            lit("semDeDup: ragged vector widths in cell "),
            col("__g").cast("string"),
            lit(" — per-position member counts span ["),
            col("n_min").cast("string"), lit(", "),
            col("n_max").cast("string"),
            lit("]; fix the embedding widths upstream")))).as("n"),
        col("sv"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // cells are metadata-sized by contract, but at SemDeDup-paper scale
    // (~100k clusters × 1536 dims) the sum-vector relation is ~1 GB —
    // material enough that the broadcast is MEASURED (rows AND
    // elements, the measuredDropSide discipline), falling back to a
    // shuffle-hash build on the cell side past the ceiling
    val cellSide = measuredDropSide(cellS, "sv")
    val scored = embeddings.select(col(idCol).as("doc_id"),
        col(groupCol).as("__g"), col(vecCol).as("__v"))
      .join(cellSide, Seq("__g"))
      .select(col("doc_id"),
        aggregate(
          zip_with(
            when(col("__v").isNotNull, col("__v"))
              .otherwise(raise_error(concat(
                lit("semDeDup: NULL embedding for doc_id "),
                col("doc_id").cast("string")))),
            col("sv"),
            (x, s) => col("n") * milli(x) - s),
          dec(lit(0)),
          (acc, d) => acc + dec(d) * dec(d)).as("far_score"))
    keepBest(scored, "far_score", pairs)
      .select(col("doc_id"), col("comp"), col("keep"))
  }

  // --------------------------------------------- fuzzy string matching

  /** Record-linkage fuzzy self-join: every pair of SHORT strings within
    * Levenshtein distance `maxDist` — entity resolution over names /
    * titles / codes, where the token-set machinery above is the wrong
    * granularity. Sound candidate generation by the one-sided rare-gram
    * prefix filter (the [[containmentPairs]] pattern) over POSITIONAL
    * q-grams: one edit overlaps ≤ q gram occurrences and shifts
    * survivors by ≤ 1, so k edits destroy ≤ k·q occurrences and any
    * survivor lands in the partner within ±k positions — each string's
    * k·q+1 RAREST (gram, position-bucket) keys therefore keep at least
    * one survivor findable by an equi-join on (gram, bucket) with the
    * partner exploding to adjacent buckets (the [[graft.operators.RangeJoin]]
    * bucket trick; bucket width k+1 covers the shift). The POSITION in
    * the join key is what keeps shared prefixes cheap: a gram common to
    * every row still splits across its positions, where a value-only
    * join would square its frequency (measured 34 s → ~4 s at sf0.1 on
    * the prefix-heavy customer names). Exact `levenshtein` verifies
    * candidates after the ‖a|−|b‖ ≤ k length filter.
    *
    * Contract: strings need length ≥ q·(maxDist+1), else k edits can
    * wipe the whole signature; `validate = true` (default) enforces this
    * IN-PASS — a codegen `raise_error` guard on the string projection
    * fails the job loudly at the first violating row, at zero extra
    * scans (an earlier revision paid a pre-flight counts-only job — a
    * full extra pass over the corpus before the real work). Shuffles
    * carry (gram, bucket, id) rows and candidate pairs — never the
    * string table squared. Output: (a_id, b_id, dist), a_id < b_id. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 3, validate: Boolean = true): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val sigSize = maxDist * q + 1
    val base = df.select(col(idCol).cast("long").as("id"),
      checkedStr(col(strCol), q, maxDist, validate).as("s"))
    def gramsOf(b: DataFrame): DataFrame =
      b.select(col("id"), posexplode(expr(
        s"transform(sequence(1, greatest(length(s) - ${q - 1}, 0)), " +
          s"i -> substring(s, i, $q))")).as(Seq("pos", "g")))
        .withColumn("bk", expr(s"pos div ${maxDist + 1}"))
    val grams = gramsOf(base)
    val dfreq = grams.groupBy("g", "bk").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("g"), col("pos"))
    // the sig-window exchange width is pinned EXPLICITLY (an explicit
    // repartition is exempt from AQE partition coalescing): the window +
    // candidate-probe + verify chain downstream is compute-dense
    // (row_number ranking, the broadcast-hash probe over the ±1-bucket
    // explosion, levenshtein verification) but byte-light, so AQE's
    // size-based coalescing squeezed it onto TWO tasks of a 32-core box
    // (round-15 profile: a 2.9 s two-task job = the entry's critical
    // path). Width is data-sized, so at real scale this is exactly the
    // exchange the window needed anyway. (Round-14/15 negative A/Bs at
    // this site, kept for the record: fanning the gram scan for all
    // three consumers 4.3 → 5.8 s; a (g, bk)-checkpointed shared gram
    // relation 4.3 → 8.5 s — prefix-heavy names skew (g, bk) and the
    // forced sort-merge join beats nothing; fanning only the ±1-bucket
    // branch 4.3 → 7.0 s — it is the broadcast BUILD side, so the
    // exchange bought no parallelism.)
    val sig = grams.join(dfreq, Seq("g", "bk"))
      .repartition(graft.functions.PlanShape.dataSizedParts(grams),
        col("id"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= sigSize)
      .select(col("id").as("sig_id"), col("g"), col("bk"))
    val full = gramsOf(base)
      .select(col("id").as("full_id"), col("g"),
        explode(array(col("bk") - 1, col("bk"), col("bk") + 1)).as("bk"))
    val cand = sig.join(full, Seq("g", "bk"))
      .where(col("sig_id") =!= col("full_id"))
      .select(least(col("sig_id"), col("full_id")).as("a_id"),
        greatest(col("sig_id"), col("full_id")).as("b_id"))
      .distinct()
    cand
      .join(base.select(col("id").as("a_id"), col("s").as("sa")), "a_id")
      .join(base.select(col("id").as("b_id"), col("s").as("sb")), "b_id")
      .where(abs(length(col("sa")) - length(col("sb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("sa"), col("sb"), maxDist))
      .where(col("dist") >= 0) // threshold form: -1 = early-exited
      .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
  }

  /** The in-pass soundness-floor guard for the edit-distance family:
    * passes the string through unless it is shorter than q·(maxDist+1)
    * chars, in which case the job fails loudly at that row — the same
    * contract the old pre-flight count enforced, with no extra scan.
    * NULL strings pass through (and produce no grams downstream), the
    * same way the old pre-flight `length(s) < floor` count never
    * counted them — a NULL must not fall into the raise_error branch. */
  private[graft] def checkedStr(s: Column, q: Int, maxDist: Int,
                         validate: Boolean): Column = {
    if (!validate) s
    else {
      val floor = q * (maxDist + 1)
      when(s.isNull || length(s) >= floor, s).otherwise(raise_error(concat(
        lit(s"editDistancePairs: string shorter than $floor chars — " +
          s"below the soundness floor for maxDist=$maxDist/q=$q " +
          "(shorten q or route short strings to an exact pass): '"),
        s, lit("'"))))
    }
  }

  /** Bipartite [[editDistancePairs]] — the record-linkage INGEST shape
    * (the [[minHashLshPairsBipartite]] pattern): link a new batch
    * against a master table, never master×master. Signatures come from
    * the NEW side (the survival argument only needs the new string's
    * k·q+1 positional grams; rarity ranks by the MASTER's gram
    * frequencies, since master is what the signature probes) and the
    * ±1-bucket explosion rides the small signature side. Master's gram
    * relation is persistable — a daily batch links without re-gramming
    * history. Output: (new_id, master_id, dist). */
  def editDistancePairsBipartite(newDf: DataFrame, masterDf: DataFrame,
      idCol: String, strCol: String, maxDist: Int, q: Int = 3,
      validate: Boolean = true): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    def basify(df: DataFrame): DataFrame =
      df.select(col(idCol).cast("long").as("id"),
        checkedStr(col(strCol), q, maxDist, validate).as("s"))
    val masterBase = basify(masterDf)
    val masterGrams = linkageGramsOf(masterBase, maxDist, q)
    val dfreq = masterGrams.groupBy("g", "bk").agg(count(lit(1)).as("df"))
    editDistancePairsAgainst(basify(newDf), masterGrams, dfreq, masterBase,
      maxDist, q)
  }

  /** Positional q-gram relation (id, pos, g, bk) of a (id, s) base — the
    * persistable master-side state of incremental record linkage (see
    * [[graft.streaming.StreamingLinkage]]): a daily batch links against
    * it without re-gramming history. */
  private[graft] def linkageGramsOf(base: DataFrame, maxDist: Int,
                                    q: Int): DataFrame =
    base.select(col("id"), posexplode(expr(
        s"transform(sequence(1, greatest(length(s) - ${q - 1}, 0)), " +
          s"i -> substring(s, i, $q))")).as(Seq("pos", "g")))
      .withColumn("bk", expr(s"pos div ${maxDist + 1}"))

  /** The bipartite linkage core over PREPARED master relations:
    * `masterGrams` = [[linkageGramsOf]] of the master, `masterDfreq` =
    * its (g, bk, df) frequencies, `masterBase` = (id, s) for
    * verification — all three persistable, so an incremental/streaming
    * caller pays only the NEW side's grams per batch. `newBase` is
    * (id, s). Output: (new_id, master_id, dist). */
  private[graft] def editDistancePairsAgainst(newBase: DataFrame,
      masterGrams: DataFrame, masterDfreq: DataFrame, masterBase: DataFrame,
      maxDist: Int, q: Int): DataFrame = {
    val sigSize = maxDist * q + 1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("g"), col("pos"))
    val newGrams = linkageGramsOf(newBase, maxDist, q)
    // explicit width pin on the sig-window exchange — the
    // editDistancePairs rationale (AQE coalesced the compute-dense
    // window + probe chain onto two tasks)
    val sig = newGrams
      .join(masterDfreq, Seq("g", "bk"), "left")
      .repartition(graft.functions.PlanShape.dataSizedParts(newGrams),
        col("id"))
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= sigSize)
      .select(col("id").as("new_id"), col("g"),
        explode(array(col("bk") - 1, col("bk"), col("bk") + 1)).as("bk"))
    val cand = sig
      .join(masterGrams.select(col("id").as("master_id"), col("g"),
        col("bk")), Seq("g", "bk"))
      .select("new_id", "master_id").distinct()
    cand
      .join(newBase.select(col("id").as("new_id"), col("s").as("sa")),
        "new_id")
      .join(masterBase.select(col("id").as("master_id"),
        col("s").as("sb")), "master_id")
      .where(abs(length(col("sa")) - length(col("sb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("sa"), col("sb"), maxDist))
      .where(col("dist") >= 0) // threshold form: -1 = early-exited
      .select(col("new_id"), col("master_id"),
        col("dist").cast("long").as("dist"))
  }

  /** Sorted-neighborhood record linkage (Hernández & Stolfo 1995) —
    * the third candidate generator beside positional rare-gram
    * signatures ([[editDistancePairs]]) and banded MinHash: sort each
    * block by the string itself and compare only rows within `window`
    * sort positions. The method of choice when near-duplicates SORT
    * near each other (serial numbers, timestamps-in-names, padded
    * codes) — regimes where gram rarity is uninformative because every
    * gram is common.
    *
    * `blockCol` bounds the sort: ranks are `row_number` within each
    * block (one shuffle on the block key — never a global
    * single-partition sort). Candidates join on block equality PLUS a
    * rank BUCKET of width `window` (a rank-band partner rb ∈
    * (r, r+window] lives in bucket ⌊r/window⌋ or the next one, so the
    * left side replicates into those two buckets and each true pair
    * surfaces from exactly one) — the interval-bucketing trick of
    * [[graft.operators.RangeJoin]], which keeps a large block's join
    * LINEAR in block size × window where a bare rank-band condition
    * under a block-only equi-join degrades to block² nested-loop
    * comparisons (1M-serial probe: 20.2 → 9.0 s, same pairs; at
    * 100 TB a hot block would serialize without it). Unlike the gram
    * signature path
    * this generator is NOT complete — a true pair sorted more than
    * `window` apart (typo in the first character) is missed; that
    * recall/cost trade is the method. Verification is exact
    * Levenshtein. Output: (a_id, b_id, dist), a_id < b_id, each
    * unordered pair once. */
  def sortedNeighborPairs(df: DataFrame, idCol: String, strCol: String,
                          blockCol: String, window: Int,
                          maxDist: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bk").orderBy("s", "id")
    val ranked = df
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"),
        col(blockCol).as("bk"))
      .where(col("s").isNotNull && col("bk").isNotNull)
      .withColumn("r", row_number().over(w).cast("long"))
    def bu(r: Column) = floor(r / lit(window.toLong)).cast("long")
    ranked.select(col("bk"), col("r"), col("id").as("lo_id"),
        col("s").as("sa"),
        explode(array(bu(col("r")), bu(col("r")) + 1L)).as("bu"))
      .join(ranked.select(col("bk"), bu(col("r")).as("bu"),
        col("r").as("rb"), col("id").as("hi_id"), col("s").as("sb")),
        Seq("bk", "bu"))
      .where(col("rb") > col("r") && col("rb") <= col("r") + window)
      .withColumn("dist", levenshtein(col("sa"), col("sb"), maxDist))
      .where(col("dist") >= 0) // threshold form: -1 = early-exited
      .select(least(col("lo_id"), col("hi_id")).as("a_id"),
        greatest(col("lo_id"), col("hi_id")).as("b_id"),
        col("dist").cast("long").as("dist"))
  }

  /** Golden-record survivorship — the step AFTER linkage + connected
    * components in an entity-resolution pipeline: collapse each entity
    * cluster to ONE row by picking, PER FIELD, the value from the most
    * recent row that actually has it (latest-non-null-wins — a newer
    * record with a missing phone must not erase the older phone).
    *
    * Deterministic: recency is the caller's `orderCols` tuple
    * (timestamp, then a unique id as the tiebreak), and each field
    * survives from the row maximizing (has-the-field, recency…) —
    * `max_by` over a struct key, whose lexicographic ordering (false <
    * true, NULL recency smallest) replays exactly the earlier
    * window formulation's (is-null ASC, recency DESC) row_number rule.
    *
    * Shape: ONE map-side-combinable aggregate for ALL fields — no
    * window, no sort, no per-field pass. The previous row_number
    * formulation exchanged the corpus once PER FIELD and sorted each
    * partition (100M-row probe: 121 s for 2 fields); the aggregate
    * form exchanges only the per-entity partial maxima (44 s, same
    * output). Clusters of any size stream through — nothing is
    * collected, and a million-row entity costs its combiner one
    * running maximum, not a sort.
    *
    * Output: one row per entity — entityCol + each field's surviving
    * value (NULL only when the whole cluster lacks it). */
  def goldenRecords(df: DataFrame, entityCol: String,
                    orderCols: Seq[String],
                    fields: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one recency column")
    require(fields.nonEmpty, "need at least one field to survive")
    def key(f: String) =
      struct(col(f).isNotNull +: orderCols.map(col): _*)
    val aggs = fields.map(f => max_by(col(f), key(f)).as(f))
    df.groupBy(col(entityCol)).agg(aggs.head, aggs.tail: _*)
  }

  // --------------------------------------------------- LSH band planning

  /** LSH band-plan curve — the knob-picker for [[minHashLshPairs]]'s
    * (bands, rowsPerBand) split, the Jaccard twin of
    * [[graft.query.Calibrate]] for nprobe. For every factorization
    * b·r = `numHashes`, the S-curve probability that a pair at Jaccard
    * `thresholdPct`/100 surfaces as a candidate:
    *   p = 1 − (1 − t^r)^b
    * exposed as integer basis points. More bands = higher capture but
    * more candidate work (each band is one more hash-join key per doc);
    * the planner makes the trade explicit instead of hard-coding it.
    * Metadata-sized (divisor count of numHashes ≤ a few dozen rows) —
    * computed in-plan so the SQL oracle replays identical arithmetic.
    *
    * The pow chain runs in scale-1e9 FIXED POINT (t is exact at that
    * scale; each multiply floor-rescales), not double `pow`: engines'
    * `pow` may differ in the last ulp, and a result landing exactly on a
    * basis-point boundary would then floor differently across engines —
    * integer folds are bit-identical everywhere. Downward bias is ≤
    * (r+b) ulp of 1e-9 ≪ 1 bp. */
  def lshPlan(spark: org.apache.spark.sql.SparkSession, numHashes: Int,
      thresholdPct: Int): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    require(thresholdPct >= 1 && thresholdPct <= 100,
      s"thresholdPct must be in 1..100, got $thresholdPct")
    val S = 1000000000L                       // fixed-point 1.0
    val T = thresholdPct.toLong * 10000000L   // t, exact at scale S
    spark.range(1, numHashes + 1).toDF("bands")
      .where(lit(numHashes) % col("bands") === 0)
      .withColumn("rows_per_band", expr(s"$numHashes div bands"))
      // t^r then (1 - t^r)^b, each step (acc·x) div S on longs:
      // acc ≤ 1e9 and x ≤ 1e9 so products stay ≤ 1e18 < Long.Max
      .withColumn("t_r", expr(
        s"aggregate(sequence(1, cast(rows_per_band as int)), ${S}L, " +
          s"(acc, i) -> (acc * ${T}L) div ${S}L)"))
      .withColumn("miss", expr(
        s"aggregate(sequence(1, cast(bands as int)), ${S}L, " +
          s"(acc, i) -> (acc * (${S}L - t_r)) div ${S}L)"))
      .withColumn("p_capture_bp",
        expr(s"(10000 * (${S}L - miss)) div ${S}L"))
      .drop("t_r", "miss")
  }

  /** The cheapest plan reaching a target capture probability: the row of
    * [[lshPlan]] with the FEWEST bands whose p ≥ `targetBp` basis points
    * (fewer bands = fewer join keys = less candidate work). Empty when
    * even all-bands-of-one can't reach the target — the caller needs
    * more hashes, not a different split. */
  def lshRecommend(spark: org.apache.spark.sql.SparkSession, numHashes: Int,
      thresholdPct: Int, targetBp: Int): DataFrame =
    lshPlan(spark, numHashes, thresholdPct)
      .where(col("p_capture_bp") >= targetBp)
      .orderBy(col("bands")).limit(1)

  // ------------------------------------------- line-level boilerplate

  /** Line relation for line-level dedup: (doc_id, pos, lh) where `lh`
    * is the xxhash64 of each `delim`-separated line. Narrow explode —
    * the TEXT never leaves its row; only fixed-width hash rows flow
    * into the aggregates and joins downstream. */
  private def lineHashes(docs: DataFrame, delim: String): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote(delim), -1))
          .as(Seq("pos", "line")))
      .select(col("doc_id"), col("pos"), xxhash64(col("line")).as("lh"))

  /** Lines that recur across the corpus: (lh, line_docs) for every line
    * appearing in >= `minDocs` DISTINCT documents. The CCNet / RefinedWeb
    * boilerplate signal (Wenzek et al. 2020 dedup paragraphs by hash
    * across shards; Penedo et al. 2023 strip repeated lines): headers,
    * nav bars, cookie banners and license blurbs repeat across many
    * pages while real content does not. Shuffle = distinct (lh, doc_id)
    * pairs then a map-side-combined count — line-vocabulary-sized,
    * never document-sized. */
  def commonLines(docs: DataFrame, delim: String = "\n",
      minDocs: Int = 5): DataFrame =
    lineDocCounts(docs, delim).where(col("line_docs") >= minDocs)

  /** Per-line distinct-document counts WITHOUT a threshold —
    * the mergeable STATE behind [[commonLines]]: (lh, line_docs).
    * Counts over doc-disjoint batches are additive (each doc counts
    * its lines once, in exactly one batch), so a 100 TB ingest keeps
    * this relation as a persisted table and each arriving batch merges
    * its own counts in via [[mergeLineCounts]] — no corpus rescan,
    * the same persistable-state shape as the incremental LSH band
    * relation. */
  def lineDocCounts(docs: DataFrame, delim: String = "\n"): DataFrame =
    lineHashes(docs, delim).select("lh", "doc_id").distinct()
      .groupBy("lh").agg(count(lit(1)).as("line_docs"))

  /** Merge two [[lineDocCounts]] relations built over DOC-DISJOINT
    * batches (a document present in both would double-count): one
    * map-side-combined sum per line hash, line-vocabulary-sized. */
  def mergeLineCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("lh").agg(sum(col("line_docs")).as("line_docs"))

  /** Boilerplate removal: strip every line occurring in >= `minDocs`
    * distinct documents, preserving the order of the survivors. Output:
    * (doc_id, n_lines, n_dropped, clean_text) for EVERY input document
    * (fully-boilerplate documents keep an empty clean_text — dropping
    * them is [[graft.pipeline.CorpusClean]]'s decision, not this
    * operator's).
    *
    * Scale shape: the heavy text column is never exploded into a
    * shuffle. Candidate generation runs on fixed-width (lh, doc_id,
    * pos) rows; the per-doc DROPPED POSITIONS (bounded by each doc's
    * boilerplate count, typically a handful) join back onto the intact
    * docs relation — with AQE that join broadcasts the positions side —
    * and the strip itself is one higher-order-function projection
    * (`filter` by position) inside codegen. */
  def removeBoilerplate(docs: DataFrame, delim: String = "\n",
      minDocs: Int = 5): DataFrame =
    removeBoilerplateWith(docs, commonLines(docs, delim, minDocs), delim)

  /** The strip half of [[removeBoilerplate]], against an EXPLICIT
    * boilerplate relation (any (lh) set — typically a thresholded
    * [[lineDocCounts]] state maintained incrementally). This is the
    * stream-static form: new documents clean against yesterday's
    * corpus-wide line counts without touching the corpus. */
  def removeBoilerplateWith(docs: DataFrame, boilerRel: DataFrame,
      delim: String = "\n"): DataFrame = {
    val qdelim = java.util.regex.Pattern.quote(delim)
    val boiler = boilerRel.select("lh")
    val drops = lineHashes(docs, delim)
      .join(boiler, "lh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("drop_pos"))
    docs.join(drops, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(split(col("text"), qdelim, -1)).cast("long").as("n_lines"),
        // size(NULL) is -1 under the default legacy sizeOfNull, so the
        // no-drops case needs an explicit branch, not a coalesce
        when(col("drop_pos").isNull, lit(0))
          .otherwise(size(col("drop_pos"))).cast("long").as("n_dropped"),
        array_join(
          filter(split(col("text"), qdelim, -1),
            (_, i) => !array_contains(coalesce(col("drop_pos"),
              array().cast("array<int>")), i)),
          delim).as("clean_text"))
  }

  /** Per-document DUPLICATION DEGREE — each document's number of
    * near-duplicate partners (its degree in the pair graph). The soft
    * alternative to a drop list: duplication-aware sampling down-weights
    * heavily duplicated content (e.g. keep probability ∝ 1/(1+degree))
    * instead of hard-dropping it, preserving rare text while flattening
    * boilerplate clusters. `pairs` is any (a_id, b_id) near-dup relation
    * from this module; `ids` the full (doc_id) universe so degree-0
    * documents appear. One explode + map-side-combined count — degree
    * rows are fixed-width, never the pair list per doc.
    * Output: (doc_id, n_dups). */
  def duplicationDegree(ids: DataFrame, pairs: DataFrame): DataFrame =
    ids.select(col("doc_id"))
      .join(pairs
        .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n"), lit(0L)).as("n_dups"))
}
