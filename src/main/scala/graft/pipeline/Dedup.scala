package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines.
  *
  * Five tiers, cheapest to richest, all over `documents(doc_id, text)`:
  *   1. exact        — md5 content hash, one groupBy
  *   2. jaccardPairs — exact token-set Jaccard via an inverted-index join
  *   3. minHashLsh   — MinHash signatures + banded LSH candidates, then
  *                     exact verification (the 100 TB path: candidate count
  *                     ≪ n², verification touches only candidate pairs)
  *   4. simHash      — 64-bit SimHash signatures; near-dup = small Hamming
  *                     distance, bucketed by bit-bands
  *   5. embedding near-dup — cosine threshold over embedding vectors
  *
  * Scale notes baked into each operator:
  *  - The inverted-index join shuffles (token, doc) pairs — at 100 TB hot
  *    tokens explode quadratically, so [[tokenDocPairs]] takes a document-
  *    frequency cap that drops tokens appearing in more than `maxDf` docs
  *    (standard candidate-pruning; exactness is restored by the verify
  *    stage which only ever *scores* candidate pairs).
  *  - MinHash signatures are fixed-width arrays (numHashes × 8 bytes) —
  *    ~1 KB per doc regardless of document size, so the LSH band join
  *    shuffles signatures, never text.
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

  // ------------------------------------------------- token-set Jaccard

  /** (doc_id, tok) distinct pairs — the inverted index. `maxDf` drops
    * ubiquitous tokens (df > maxDf) from candidate generation. */
  def tokenDocPairs(docs: DataFrame, maxDf: Option[Int] = None): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
    maxDf match {
      case None => pairs
      case Some(cap) =>
        val df = pairs.groupBy("tok").agg(count(lit(1)).as("df")).where(col("df") <= cap)
        pairs.join(broadcast(df.select("tok")), "tok")
    }
  }

  /** Exact token-set Jaccard pairs with jaccard >= thresholdPct/100.
    * Output is integer-only: (a_id, b_id, inter, union); the threshold is
    * applied as `100*inter >= thresholdPct*union` so no float ever decides
    * membership. Plan: inverted-index self-join on token (shuffle on a
    * token-hash — co-partitioned, no cross join), count intersections,
    * then a broadcast join against per-doc set sizes. */
  def jaccardPairs(docs: DataFrame, thresholdPct: Int,
                   maxDf: Option[Int] = None): DataFrame = {
    val toks = tokenDocPairs(docs, maxDf)
    val sizes = docs.select(
      col("doc_id"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("set_sz"))
    val inter = toks.as("x").join(toks.as("y"), col("x.tok") === col("y.tok"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.as("sa")), col("a_id") === col("sa.doc_id"))
      .join(broadcast(sizes.as("sb")), col("b_id") === col("sb.doc_id"))
      .select(col("a_id"), col("b_id"), col("inter"),
        (col("sa.set_sz") + col("sb.set_sz") - col("inter")).as("union_sz"))
      .where(col("inter") * 100 >= col("union_sz") * thresholdPct)
  }

  // ------------------------------------------------------------ MinHash

  /** Per-token 64-bit base hashes (xxhash64) — the Karp–Rabin-style
    * shingle fingerprints that seed the MinHash family. */
  def shingleHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      transform(array_distinct(split(col("text"), " ")), t => xxhash64(t)).as("hashes"))

  /** MinHash signature: hash family hᵢ(tok) = xxhash64(tok, i) (a salted
    * 64-bit hash per "permutation"), min over the token set. Salting
    * avoids multiply-mod arithmetic that would overflow under ANSI mode.
    * Computed entirely inside codegen (transform + array_min over the
    * token array) — one narrow projection, no shuffle. */
  def minHashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    val toks = array_distinct(split(col("text"), " "))
    val sig = array((0 until numHashes).map(i =>
      array_min(transform(toks, t => xxhash64(t, lit(i))))): _*)
    docs.select(col("doc_id"), sig.as("sig"))
  }

  /** LSH candidate pairs: split the signature into `bands` bands of
    * `rowsPerBand` hashes; docs sharing any band bucket are candidates.
    * The band join shuffles only (band, bucket-hash, doc_id) — tiny rows —
    * and a groupBy over identical buckets yields pairs. */
  def lshCandidates(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = signatures.select(
      col("doc_id"),
      posexplode(
        array((0 until bands).map(b =>
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)): _*)))
      .toDF("doc_id", "band", "bucket")
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** MinHash+LSH dedup with exact verification: candidates from the band
    * join, then exact token-set Jaccard computed ONLY for candidate pairs.
    * Output = verified pairs at jaccard >= thresholdPct/100 — integer-only
    * like [[jaccardPairs]]. With bands=32, rowsPerBand=4 the probability of
    * missing a pair at j >= 0.9 is (1−j⁴)³² < 2e-15, so the result equals
    * the exact-Jaccard output while scanning candidate pairs only. */
  def minHashLshPairs(docs: DataFrame, thresholdPct: Int,
                      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val cands = lshCandidates(minHashSignatures(docs, numHashes), bands, numHashes / bands)
    val sets = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("toks"))
    cands
      .join(sets.as("da"), col("a_id") === col("da.doc_id"))
      .join(sets.as("db"), col("b_id") === col("db.doc_id"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("da.toks"), col("db.toks"))).cast("long").as("inter"),
        size(array_union(col("da.toks"), col("db.toks"))).cast("long").as("union_sz"))
      .where(col("inter") * 100 >= col("union_sz") * thresholdPct)
  }

  // ------------------------------------------------------------ SimHash

  /** 64-bit SimHash over the distinct token set: per bit, sum ±1 votes of
    * each token's xxhash64 bit, sign → bit. Permutation-invariant (set
    * semantics). Computed as 64 aggregate() folds inside one projection. */
  def simHashSignatures(docs: DataFrame): DataFrame = {
    val bits = (0 until 64).map { i =>
      // vote_i = Σ_tok (bit_i(hash(tok)) ? 1 : -1); bit set iff vote > 0
      val vote = aggregate(col("hashes"), lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    shingleHashes(docs).select(col("doc_id"),
      bits.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Pairs of documents with identical SimHash (Hamming distance 0 — for
    * this operator's oracle, equal token sets). */
  def simHashDupPairs(docs: DataFrame): DataFrame = {
    val sigs = simHashSignatures(docs)
    sigs.as("x").join(sigs.as("y"),
        col("x.simhash") === col("y.simhash") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
  }

  /** [[simHashDupPairs]] with exact verification: candidates from SimHash
    * equality (a 64-bit hash join — cheap at any scale since signatures
    * are 8 bytes/doc), confirmed by exact token-set equality. Equal sets
    * always produce equal SimHash, so this is exactly the set-equal dup
    * relation, found without ever joining on full texts. */
  def simHashDupPairsVerified(docs: DataFrame): DataFrame = {
    val sets = docs.select(col("doc_id"),
      array_sort(array_distinct(split(col("text"), " "))).as("tok_set"))
    simHashDupPairs(docs)
      .join(sets.as("va"), col("a_id") === col("va.doc_id"))
      .join(sets.as("vb"), col("b_id") === col("vb.doc_id"))
      .where(col("va.tok_set") === col("vb.tok_set"))
      .select(col("a_id"), col("b_id"))
  }

  /** Near-dup pairs at Hamming distance <= maxHamming, bucketed by 4
    * 16-bit bands (pigeonhole: any pair within Hamming 3 shares at least
    * one exact band). Shuffles only (band, 16-bit chunk, doc_id). */
  def simHashNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole covers Hamming <= 3")
    val sigs = simHashSignatures(docs)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .toDF("doc_id", "simhash", "band", "chunk")
    val popcount = (c: Column) => {
      // Hamming weight via bit_count (Spark 3.3+)
      bit_count(c)
    }
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        popcount(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // ------------------------------------------- embedding near-duplicates

  /** Near-duplicate pairs by embedding cosine similarity above
    * thresholdMilli/1000. Brute-force all-pairs — correct baseline; the
    * scale path buckets by IVF partition first (see graft.index) so only
    * same/neighbor-cell pairs are scored. Output ids only (cosine values
    * are order-stable but not bit-stable across engines). */
  def embeddingNearDupPairs(embeddings: DataFrame, thresholdMilli: Int,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
    e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        VectorFunctions.cosine(col("x.v"), col("y.v")).as("cos"))
      .where(col("cos") * 1000 >= thresholdMilli)
      .select(col("a_id"), col("b_id"))
  }
}
