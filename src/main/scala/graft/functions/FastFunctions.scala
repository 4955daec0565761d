package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Column API over the [[Kernels]] — each function becomes a single
  * `StaticInvoke` Catalyst expression, which generates a direct method
  * call inside WholeStageCodegen. Preferred over UDFs (no row boxing, no
  * closure serialization) and over SQL higher-order functions (which
  * interpret a lambda per array element).
  */
object FastFunctions {

  /** Expected input types per kernel — declared on every StaticInvoke so
    * analysis validates (and where legal, coerces) arguments instead of
    * letting UnsafeArrayData reinterpret bytes of the wrong type. Shared
    * with the SQL registry ([[graft.GraftFunctions]]), which is the
    * user-facing surface where mistyped arguments actually happen. */
  private[graft] val kernelInputTypes: Map[String, Seq[DataType]] = Map(
    "sqL2f" -> Seq(ArrayType(FloatType), ArrayType(FloatType)),
    "dotf" -> Seq(ArrayType(FloatType), ArrayType(FloatType)),
    "cosinef" -> Seq(ArrayType(FloatType), ArrayType(FloatType)),
    "norm2Safe" -> Seq(ArrayType(DoubleType)),
    "hashEmbedF" -> Seq(ArrayType(StringType), IntegerType),
    "norm2SafeF" -> Seq(ArrayType(FloatType)),
    "tokenHashesSorted" -> Seq(ArrayType(StringType)),
    "shingleHashesSorted" -> Seq(ArrayType(StringType), IntegerType),
    "shingleHashes" -> Seq(ArrayType(StringType), IntegerType),
    "winnowedFingerprints" -> Seq(ArrayType(StringType), IntegerType,
      IntegerType),
    "bitsAboveMean" -> Seq(ArrayType(FloatType)),
    "gradientBits" -> Seq(ArrayType(FloatType), IntegerType, IntegerType),
    "signBits" -> Seq(ArrayType(FloatType), ArrayType(DoubleType)),
    "hammingDist" -> Seq(ArrayType(LongType), ArrayType(LongType)),
    "bloomHit" -> Seq(ArrayType(LongType), IntegerType, LongType),
    "shingleRepetition" -> Seq(ArrayType(StringType), IntegerType),
    "interSortedSize" -> Seq(ArrayType(LongType), ArrayType(LongType)),
    "lastLeIdx" -> Seq(ArrayType(LongType), LongType),
    "firstCommon" -> Seq(ArrayType(LongType), ArrayType(LongType)),
    "firstEqualIdx" -> Seq(ArrayType(LongType), ArrayType(LongType)),
    "minhashSig" -> Seq(ArrayType(LongType), IntegerType),
    "minhashSigOPH" -> Seq(ArrayType(LongType), IntegerType),
    "bandKeys" -> Seq(ArrayType(LongType), IntegerType),
    "simhash64" -> Seq(ArrayType(LongType)),
    "topCellsL2" -> Seq(ArrayType(FloatType), ArrayType(DoubleType), IntegerType),
    "nearestCentroidL2" -> Seq(ArrayType(FloatType), ArrayType(DoubleType)),
    "subCentroidF" -> Seq(ArrayType(FloatType), ArrayType(DoubleType), IntegerType),
    "pqEncodeF" -> Seq(ArrayType(FloatType), ArrayType(DoubleType),
      IntegerType, IntegerType),
    "pseudoRandomVec" -> Seq(LongType, IntegerType, LongType),
    "clusteredVec" -> Seq(LongType, IntegerType, IntegerType, DoubleType,
      LongType),
    "momentsUpper" -> Seq(ArrayType(FloatType)),
    "matvecRows" -> Seq(ArrayType(FloatType), ArrayType(DoubleType)),
    "rotateF" -> Seq(ArrayType(FloatType), ArrayType(DoubleType)),
    "byteBucketSums" -> Seq(BinaryType, IntegerType),
    "sampledFrameSums" -> Seq(BinaryType, IntegerType, IntegerType),
    "audioSegmentStats" -> Seq(BinaryType, IntegerType),
    "silenceProfile" -> Seq(BinaryType, IntegerType, LongType),
    "jaroWinkler" -> Seq(StringType, StringType),
    "damerauLevenshtein" -> Seq(StringType, StringType),
    "stubDecodeGray" -> Seq(BinaryType, IntegerType, IntegerType),
    "meanPool" -> Seq(ArrayType(FloatType), IntegerType, IntegerType,
      IntegerType, IntegerType),
    "adcDist" -> Seq(ArrayType(IntegerType), ArrayType(DoubleType), IntegerType),
    "nfcNormalize" -> Seq(StringType),
    "nfkcNormalize" -> Seq(StringType),
    "deflateLen" -> Seq(StringType),
    "stripAccents" -> Seq(StringType),
    "sq8Encode" -> Seq(ArrayType(FloatType), ArrayType(DoubleType),
      ArrayType(DoubleType)),
    "sq8Decode" -> Seq(BinaryType, ArrayType(DoubleType), ArrayType(DoubleType)),
    "sq8Dist" -> Seq(ArrayType(DoubleType), BinaryType, ArrayType(DoubleType),
      ArrayType(DoubleType)),
    "pqDistDirect" -> Seq(ArrayType(FloatType), ArrayType(DoubleType),
      ArrayType(IntegerType), ArrayType(DoubleType)),
    "adcTableF" -> Seq(ArrayType(FloatType), ArrayType(DoubleType),
      IntegerType, ArrayType(DoubleType), IntegerType, IntegerType),
    "pqReconstructF" -> Seq(ArrayType(DoubleType), ArrayType(IntegerType),
      ArrayType(DoubleType), IntegerType))

  /** A primitive-backed array<double> literal. `typedlit(Seq[Double])`
    * produces a GenericArrayData of BOXED doubles — every kernel
    * `getDouble` then pays a virtual call + unbox, which is fatal for
    * plan-literal tables read in full per row (a P×dim centroid table at
    * index-build scale is ~150k elements ⇒ ~150k unboxes PER ROW).
    * UnsafeArrayData over the primitive array makes each read one unsafe
    * load. */
  def litDoubles(a: Array[Double]): Column =
    ColumnShim.column(Literal(UnsafeArrayData.fromPrimitiveArray(a),
      ArrayType(DoubleType, containsNull = false)))

  /** A primitive-backed array<long> literal — same rationale as
    * [[litDoubles]] (Bloom bit words, posting tables). */
  def litLongs(a: Array[Long]): Column =
    ColumnShim.column(Literal(UnsafeArrayData.fromPrimitiveArray(a),
      ArrayType(LongType, containsNull = false)))

  private def invoke(dt: DataType, name: String, args: Column*): Column =
    ColumnShim.column(StaticInvoke(
      Kernels.getClass, dt, name,
      args.map(ColumnShim.expression),
      inputTypes = kernelInputTypes.getOrElse(name, Nil),
      propagateNull = true,
      returnNullable = false))

  /** ‖x‖₂ of an array<float> column with the reference's √max|x|
    * pre-scaling (Kernels.norm2SafeF). */
  def norm2SafeF(a: Column): Column =
    invoke(DoubleType, "norm2SafeF", a)

  /** ‖x‖₂ of an array<double> column, overflow-safe beyond |xᵢ|≈1e154
    * (Kernels.norm2Safe). */
  def norm2Safe(a: Column): Column =
    invoke(DoubleType, "norm2Safe", a)

  /** Feature-hashing embedding of a token array (Kernels.hashEmbedF):
    * dense array<float> of per-bucket token counts. */
  def hashEmbedF(toks: Column, dim: Int): Column =
    invoke(ArrayType(FloatType, containsNull = false), "hashEmbedF",
      toks, lit(dim))

  /** Σ (aᵢ−bᵢ)² for two array<float> columns. */
  def squaredL2F(a: Column, b: Column): Column =
    invoke(DoubleType, "sqL2f", a, b)

  /** Per-row PCA moment partial (see Kernels.momentsUpper). */
  def momentsUpper(v: Column): Column =
    invoke(ArrayType(DoubleType, containsNull = false), "momentsUpper", v)

  /** k row-dots of a float vector against a k×d row-major double matrix
    * literal (see Kernels.matvecRows). */
  def matvecRowsF(v: Column, flatRows: Column): Column =
    invoke(ArrayType(DoubleType, containsNull = false), "matvecRows", v, flatRows)

  /** R·v: orthonormal-rotation of an array<float> vector by a d×d
    * row-major double literal, result back in f32 (see Kernels.rotateF). */
  def rotateF(v: Column, flatRot: Column): Column =
    invoke(ArrayType(FloatType, containsNull = false), "rotateF", v, flatRot)

  /** Packed sign-bit signature of an array<float> vector against a
    * per-dim threshold literal (see Kernels.signBits). */
  def signBitsF(v: Column, thresholds: Column): Column =
    invoke(ArrayType(LongType, containsNull = false), "signBits",
      v, thresholds)

  /** Hamming distance between two packed array<long> signatures (see
    * Kernels.hammingDist). */
  def hammingDistF(a: Column, b: Column): Column =
    invoke(IntegerType, "hammingDist", a, b)

  /** Bloom-filter membership probe against a bit-word literal
    * ([[litLongs]]) — `numHashes` Kirsch-Mitzenmacher double-hash probes
    * derived from one 64-bit hash (Kernels.bloomHit replays
    * Kernels.bloomSet's exact positions). No false negatives, so an
    * exact verification join behind it keeps results exact. */
  def bloomHitF(bits: Column, numHashes: Column, h: Column): Column =
    invoke(BooleanType, "bloomHit", bits, numHashes, h)

  /** Σ aᵢ·bᵢ for two array<float> columns. */
  def dotF(a: Column, b: Column): Column =
    invoke(DoubleType, "dotf", a, b)

  /** Cosine similarity for two array<float> columns. */
  def cosineF(a: Column, b: Column): Column =
    invoke(DoubleType, "cosinef", a, b)

  /** Sorted distinct xxhash64 values of an array<string> column — the
    * hashed-token-set representation shared by the dedup operators. */
  def tokenHashesSorted(toks: Column): Column =
    invoke(ArrayType(LongType, containsNull = false), "tokenHashesSorted", toks)

  /** Hashed distinct token set of a whitespace-tokenized text column. */
  def hashedTokenSet(text: Column): Column =
    tokenHashesSorted(split(text, " "))

  /** Sorted distinct hashes of n-token shingles of an array<string>. */
  def shingleHashesSorted(toks: Column, n: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "shingleHashesSorted",
      toks, lit(n))

  /** Hashed n-token shingle set of a whitespace-tokenized text column. */
  def hashedShingleSet(text: Column, n: Int): Column =
    shingleHashesSorted(split(text, " "), n)

  /** POSITIONAL (unsorted, non-distinct) n-token shingle hashes of an
    * array<string> — element i hashes the window starting at token i
    * (span-level substring dedup). */
  def shingleHashes(toks: Column, n: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "shingleHashes",
      toks, lit(n))

  /** Winnowed fingerprint set (sorted distinct) of an array<string>
    * token column — density-2/(w+1) sampled n-gram hashes with the
    * exact ≥(n+w−1)-token-overlap guarantee (see
    * Kernels.winnowedFingerprints). */
  def winnowedFingerprints(toks: Column, n: Int, w: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "winnowedFingerprints",
      toks, lit(n), lit(w))

  /** 64-bit average-hash (aHash) of a ≤64-pixel float image column. */
  def bitsAboveMean(img: Column): Column =
    invoke(LongType, "bitsAboveMean", img)

  /** dHash gradient bits of a row-major w×h float image column. */
  def gradientBits(img: Column, w: Int, h: Int): Column =
    invoke(LongType, "gradientBits", img, lit(w), lit(h))

  /** (max shingle multiplicity << 32) | total shingles of a token-array
    * column — the repetition quality signal, one kernel call per row. */
  def shingleRepetition(toks: Column, n: Int): Column =
    invoke(LongType, "shingleRepetition", toks, lit(n))

  /** |A ∩ B| for two ascending-sorted array<long> columns. */
  def interSortedSize(a: Column, b: Column): Column =
    invoke(LongType, "interSortedSize", a, b)

  /** Greatest index with times[idx] <= t in an ascending array<long>,
    * −1 if none — binary search, one call per row. */
  def lastLeIdx(times: Column, t: Column): Column =
    invoke(IntegerType, "lastLeIdx", times, t)

  /** First element of `a` also present in `b` (both array<long>). */
  def firstCommon(a: Column, b: Column): Column =
    invoke(LongType, "firstCommon", a, b)

  /** First index where two array<long> columns agree, −1 if none. */
  def firstEqualIdx(a: Column, b: Column): Column =
    invoke(IntegerType, "firstEqualIdx", a, b)

  /** MinHash signature (n longs) over a hashed token set. */
  def minhashSig(hashes: Column, n: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "minhashSig", hashes, lit(n))

  /** One-permutation MinHash signature (n longs) over a hashed token
    * set — O(tokens + n) per row; see Kernels.minhashSigOPH. */
  def minhashSigOPH(hashes: Column, n: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "minhashSigOPH",
      hashes, lit(n))

  /** LSH band keys (one long per band) of a MinHash signature. */
  def bandKeys(sig: Column, bands: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "bandKeys", sig, lit(bands))

  /** 64-bit SimHash over a hashed token set. */
  def simhash64(hashes: Column): Column =
    invoke(LongType, "simhash64", hashes)

  /** nprobe nearest IVF cells (array<long>) of a float-vector column
    * against a flattened P×dim centroid literal. */
  def topCellsL2(v: Column, flatCentroids: Seq[Double], nprobe: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "topCellsL2",
      v, litDoubles(flatCentroids.toArray), lit(nprobe))

  /** Nearest IVF cell id (int) of a float-vector column against a
    * flattened P×dim centroid literal — the build's assignment pass. */
  def nearestCentroidL2(v: Column, flatCentroids: Column): Column =
    invoke(IntegerType, "nearestCentroidL2", v, flatCentroids)

  /** v − centroids[p] as f32 — the IVF residual projection. */
  def subCentroidF(v: Column, flatCentroids: Column, p: Column): Column =
    invoke(ArrayType(FloatType, containsNull = false), "subCentroidF",
      v, flatCentroids, p)

  /** All D PQ codes of a residual column against a flattened D×C×m
    * codebook literal, as array<int>. */
  def pqEncodeF(residual: Column, flatCodebooks: Column, d: Int, c: Int): Column =
    invoke(ArrayType(IntegerType, containsNull = false), "pqEncodeF",
      residual, flatCodebooks, lit(d), lit(c))

  /** Deterministic pseudo-random float vector from an id column. */
  def pseudoRandomVec(id: Column, dim: Int, seed: Long): Column =
    invoke(ArrayType(FloatType, containsNull = false), "pseudoRandomVec",
      id, lit(dim), lit(seed))

  /** Deterministic clustered vector (k tight blobs + uniform noise) from
    * an id column — the benchmark corpus where IVF cells are real. */
  def clusteredVec(id: Column, dim: Int, k: Int, spread: Double,
                   seed: Long): Column =
    invoke(ArrayType(FloatType, containsNull = false), "clusteredVec",
      id, lit(dim), lit(k), lit(spread), lit(seed))

  /** Bucketed byte sums of a binary column (deterministic fake feature). */
  def byteBucketSums(payload: Column, dim: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "byteBucketSums",
      payload, lit(dim))

  /** Byte sums of every stride-th complete frame of a binary column. */
  def sampledFrameSums(payload: Column, frameBytes: Int, stride: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "sampledFrameSums",
      payload, lit(frameBytes), lit(stride))

  /** Per-segment [energy, zero-crossings] pairs of an 8-bit-PCM-shaped
    * binary column, flattened as [e0, c0, e1, c1, …]. */
  def audioSegmentStats(payload: Column, nSegments: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "audioSegmentStats",
      payload, lit(nSegments))

  /** Jaro–Winkler similarity of two string columns (DuckDB-pinned
    * semantics: 0.7 boost threshold, prefix ≤ 4, empty → 0). */
  def jaroWinkler(a: Column, b: Column): Column =
    invoke(DoubleType, "jaroWinkler", a, b)

  /** TRUE Damerau–Levenshtein distance of two string columns
    * (Lowrance–Wagner, DuckDB-pinned semantics — transpositions that
    * later edits may cross, so CA→ABC is 2). */
  def damerauLevenshtein(a: Column, b: Column): Column =
    invoke(LongType, "damerauLevenshtein", a, b)

  /** Audio-silence profile [n_frames, n_silent, longest_run, lead,
    * trail] of an 8-bit-PCM-shaped binary column. */
  def silenceProfile(payload: Column, frameBytes: Int,
                     silentBelow: Long): Column =
    invoke(ArrayType(LongType, containsNull = false), "silenceProfile",
      payload, lit(frameBytes), lit(silentBelow))

  /** STUB gray decode of a binary column into w×h floats in [0,1]. */
  def stubDecodeGray(payload: Column, w: Int, h: Int): Column =
    invoke(ArrayType(FloatType, containsNull = false), "stubDecodeGray",
      payload, lit(w), lit(h))

  /** Mean-pool a row-major w×h float image column by (fw, fh). */
  def meanPool(img: Column, w: Int, h: Int, fw: Int, fh: Int): Column =
    invoke(ArrayType(FloatType, containsNull = false), "meanPool",
      img, lit(w), lit(h), lit(fw), lit(fh))

  /** SQ8 encode a float-vector column against per-dim (mins, Δ) codecs. */
  def sq8Encode(v: Column, mins: Column, scales: Column): Column =
    invoke(BinaryType, "sq8Encode", v, mins, scales)

  /** Decode an SQ8 binary column back to array<double>. */
  def sq8Decode(code: Column, mins: Column, scales: Column): Column =
    invoke(ArrayType(DoubleType, containsNull = false), "sq8Decode",
      code, mins, scales)

  /** Asymmetric ‖q − decode(code)‖² for an SQ8 binary column. */
  def sq8Dist(q: Column, code: Column, mins: Column, scales: Column): Column =
    invoke(DoubleType, "sq8Dist", q, code, mins, scales)

  /** ADC distance against a flattened D×C table literal. */
  /** DEFLATE byte length of a string (Kernels.deflateLen). */
  def deflateLen(s: Column): Column =
    invoke(LongType, "deflateLen", s)

  /** Accent/diacritic stripping (Kernels.stripAccents). */
  def stripAccents(s: Column): Column =
    invoke(StringType, "stripAccents", s)

  /** Unicode NFC canonical composition (Kernels.nfcNormalize). */
  def nfcNormalize(s: Column): Column =
    invoke(StringType, "nfcNormalize", s)

  /** Unicode NFKC compatibility composition (Kernels.nfkcNormalize). */
  def nfkcNormalize(s: Column): Column =
    invoke(StringType, "nfkcNormalize", s)

  def adcDist(codes: Column, flatTable: Seq[Double], numCodes: Int): Column =
    invoke(DoubleType, "adcDist", codes, litDoubles(flatTable.toArray),
      lit(numCodes))

  /** ADC distance against a flattened D×C table COLUMN — for batch ANN,
    * where each (query, probed-cell) row carries its own table. */
  def adcDistCol(codes: Column, flatTable: Column, numCodes: Int): Column =
    invoke(DoubleType, "adcDist", codes, flatTable, lit(numCodes))

  /** In-plan D×C ADC table for one (query, cell) row
    * (Kernels.adcTableF) — the distributed form of the driver-side
    * table build. */
  def adcTableF(q: Column, flatCentroids: Column, cell: Column,
                flatCodebooks: Column, d: Int, c: Int): Column =
    invoke(ArrayType(DoubleType, containsNull = false), "adcTableF",
      q, flatCentroids, cell, flatCodebooks, lit(d), lit(c))

  /** Table-free PQ distance ‖(q − centroid) − decode(codes)‖² against a
    * flattened D×C×m codebook column/literal — ANN scoring with no
    * driver-side per-query planning (streaming probes). */
  def pqDistDirect(q: Column, centroid: Column, codes: Column,
                   flatCodebooks: Column): Column =
    invoke(DoubleType, "pqDistDirect", q, centroid, codes, flatCodebooks)

  /** PQ decode + de-residualize: centroid + codebook[codes] as f32. */
  def pqReconstructF(centroid: Column, codes: Column, flatCodebooks: Column,
                     c: Int): Column =
    invoke(ArrayType(FloatType, containsNull = false), "pqReconstructF",
      centroid, codes, flatCodebooks, lit(c))
}
