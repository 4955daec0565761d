package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class KernelsSpec extends AnyFunSuite {

  private def fa(xs: Float*): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(xs.toArray)
  private def la(xs: Long*): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(xs.toArray)
  private def sa(xs: String*): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  test("sqL2f: squared euclidean distance") {
    assert(Kernels.sqL2f(fa(1f, 2f, 3f), fa(1f, 2f, 3f)) === 0.0)
    assert(Kernels.sqL2f(fa(0f, 0f), fa(3f, 4f)) === 25.0)
  }

  test("dotf: dot product") {
    assert(Kernels.dotf(fa(1f, 2f, 3f), fa(4f, 5f, 6f)) === 32.0)
    assert(Kernels.dotf(fa(), fa()) === 0.0)
  }

  test("cosinef: unit cases and zero-norm guard") {
    assert(Kernels.cosinef(fa(1f, 0f), fa(1f, 0f)) === 1.0)
    assert(Kernels.cosinef(fa(1f, 0f), fa(0f, 1f)) === 0.0)
    assert(Kernels.cosinef(fa(1f, 0f), fa(-1f, 0f)) === -1.0)
    assert(Kernels.cosinef(fa(0f, 0f), fa(1f, 2f)) === 0.0) // zero norm
  }

  test("tokenHashesSorted: sorted, distinct, permutation-invariant") {
    val h1 = Kernels.tokenHashesSorted(sa("b", "a", "c", "a"))
    val h2 = Kernels.tokenHashesSorted(sa("a", "c", "b"))
    assert(h1.toLongArray().toSeq == h2.toLongArray().toSeq)
    val arr = h1.toLongArray()
    assert(arr.length === 3)
    assert(arr.toSeq == arr.sorted.toSeq)
    assert(arr.distinct.length === arr.length)
  }

  test("interSortedSize: merge intersection vs Set intersect (100 random sets)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val a = Set.fill(rnd.nextInt(50))(rnd.nextLong(100))
      val b = Set.fill(rnd.nextInt(50))(rnd.nextLong(100))
      val got = Kernels.interSortedSize(
        UnsafeArrayData.fromPrimitiveArray(a.toArray.sorted),
        UnsafeArrayData.fromPrimitiveArray(b.toArray.sorted))
      assert(got === a.intersect(b).size.toLong)
    }
  }

  test("firstCommon: least common element under the arrays' shared order") {
    // both arrays listed in the same global order (here ascending)
    assert(Kernels.firstCommon(la(1, 5, 9), la(2, 5, 9)) === 5L)
    assert(Kernels.firstCommon(la(3, 4), la(4, 7)) === 4L)
    // symmetric because common elements keep their relative order
    assert(Kernels.firstCommon(la(2, 5, 9), la(1, 5, 9)) === 5L)
    assert(Kernels.firstCommon(la(1, 2), la(3, 4)) === 0L) // sentinel
  }

  test("firstCommon: hash-set path (large arrays) agrees with nested scan") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(60) + 20)(rnd.nextInt(200).toLong + 1).distinct.sorted
      val b = Seq.fill(rnd.nextInt(60) + 20)(rnd.nextInt(200).toLong + 1).distinct.sorted
      val expected = a.find(b.contains).getOrElse(0L)
      assert(Kernels.firstCommon(la(a: _*), la(b: _*)) === expected)
    }
    // value 0 handled despite being the empty-slot sentinel
    val withZeroA = (0L +: (1L to 40L)).toArray
    val withZeroB = (0L +: (100L to 140L)).toArray
    assert(Kernels.firstCommon(la(withZeroA: _*), la(withZeroB: _*)) === 0L)
  }

  test("two-array kernels reject dimension mismatches loudly") {
    intercept[IllegalArgumentException](Kernels.sqL2f(fa(1f), fa(1f, 2f)))
    intercept[IllegalArgumentException](Kernels.dotf(fa(1f, 2f), fa(1f)))
    intercept[IllegalArgumentException](Kernels.cosinef(fa(1f), fa(1f, 2f)))
  }

  test("tokenHashesSorted: null elements contribute no token") {
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null, UTF8String.fromString("b")))
    val r = Kernels.tokenHashesSorted(withNull)
    val clean = Kernels.tokenHashesSorted(sa("a", "b"))
    assert(r.toLongArray.toSeq === clean.toLongArray.toSeq)
  }

  test("firstEqualIdx: first position where arrays agree") {
    assert(Kernels.firstEqualIdx(la(1, 2, 3), la(9, 2, 3)) === 1)
    assert(Kernels.firstEqualIdx(la(1, 2), la(1, 2)) === 0)
    assert(Kernels.firstEqualIdx(la(1, 2), la(3, 4)) === -1)
  }

  test("minhashSig: deterministic, set-identity, expected length") {
    val s1 = Kernels.minhashSig(la(10, 20, 30), 64).toLongArray()
    val s2 = Kernels.minhashSig(la(10, 20, 30), 64).toLongArray()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length === 64)
    // superset can only lower each min
    val sup = Kernels.minhashSig(la(10, 20, 30, 40), 64).toLongArray()
    assert(s1.zip(sup).forall { case (a, b) => b <= a })
  }

  test("minhashSig: signature agreement tracks jaccard (statistically)") {
    val a = (1L to 100L).toArray
    val b = (11L to 110L).toArray // jaccard = 90/110 ≈ 0.818
    val sa = Kernels.minhashSig(UnsafeArrayData.fromPrimitiveArray(a), 256).toLongArray()
    val sb = Kernels.minhashSig(UnsafeArrayData.fromPrimitiveArray(b), 256).toLongArray()
    val agree = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    assert(agree > 0.70 && agree < 0.93, s"agreement $agree far from 0.818")
  }

  test("bandKeys: equal sigs collide per band, length = bands") {
    val sig = Kernels.minhashSig(la(1, 2, 3), 128)
    val k1 = Kernels.bandKeys(sig, 32).toLongArray()
    val k2 = Kernels.bandKeys(sig, 32).toLongArray()
    assert(k1.toSeq == k2.toSeq)
    assert(k1.length === 32)
  }

  test("simhash64: equal sets collide; different sets (generally) differ") {
    val a = Kernels.simhash64(la(1, 2, 3))
    assert(a === Kernels.simhash64(la(1, 2, 3)))
    assert(a !== Kernels.simhash64(la(4, 5, 6, 7, 8)))
  }

  test("simhash64: near sets have small hamming distance") {
    val base = (1L to 100L).toArray
    val near = (1L to 99L).toArray :+ 1000L
    val h = java.lang.Long.bitCount(
      Kernels.simhash64(UnsafeArrayData.fromPrimitiveArray(base)) ^
        Kernels.simhash64(UnsafeArrayData.fromPrimitiveArray(near)))
    assert(h <= 16, s"hamming $h too large for 98% overlap")
  }

  test("adcDist: table lookups sum") {
    // D=2, C=3, flattened row-major
    val table = new GenericArrayData(Array[Any](1.0, 2.0, 3.0, 10.0, 20.0, 30.0))
    val codes = new GenericArrayData(Array[Any](2, 0)) // table[0][2] + table[1][0]
    assert(Kernels.adcDist(codes, table, 3) === 13.0)
  }

  test("pqDistDirect: equals decode-then-sqL2 on random geometry") {
    val rnd = new scala.util.Random(13)
    val (dim, d, c) = (8, 2, 4)
    val m = dim / d
    for (_ <- 1 to 100) {
      val q = Array.fill(dim)(rnd.nextFloat() * 10 - 5)
      val cent = Array.fill(dim)(rnd.nextDouble() * 10 - 5)
      val cb = Array.fill(d * c * m)(rnd.nextDouble() * 2 - 1)
      val codes = Array.fill(d)(rnd.nextInt(c))
      val got = Kernels.pqDistDirect(
        UnsafeArrayData.fromPrimitiveArray(q),
        UnsafeArrayData.fromPrimitiveArray(cent),
        UnsafeArrayData.fromPrimitiveArray(codes),
        UnsafeArrayData.fromPrimitiveArray(cb))
      val want = (0 until dim).map { i =>
        val di = i / m
        val diff = q(i).toDouble - cent(i) - cb((di * c + codes(di)) * m + i % m)
        diff * diff
      }.sum
      assert(math.abs(got - want) < 1e-9, s"got $got want $want")
    }
  }

  test("pqDistDirect: rejects shape mismatches and bad codes loudly") {
    val q = fa(1f, 2f, 3f, 4f)
    val cent = new GenericArrayData(Array[Any](0.0, 0.0, 0.0, 0.0))
    val codes = new GenericArrayData(Array[Any](0, 0))
    // codebook sized for D=2, C=1, m=2 → 4 doubles; give 5
    val badCb = new GenericArrayData(Array[Any](1.0, 2.0, 3.0, 4.0, 5.0))
    intercept[IllegalArgumentException](
      Kernels.pqDistDirect(q, cent, codes, badCb))
    val cb = new GenericArrayData(Array[Any](1.0, 2.0, 3.0, 4.0))
    val badCodes = new GenericArrayData(Array[Any](0, 7)) // code 7 ≥ C=1
    intercept[IllegalArgumentException](
      Kernels.pqDistDirect(q, cent, badCodes, cb))
  }

  private def da(xs: Double*): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(xs.toArray)

  test("nearestCentroidL2 / subCentroidF: argmin + residual, ties to low id") {
    // two 2-dim centroids: (0,0) and (10,10)
    val flat = da(0.0, 0.0, 10.0, 10.0)
    assert(Kernels.nearestCentroidL2(fa(1f, 1f), flat) === 0)
    assert(Kernels.nearestCentroidL2(fa(9f, 9f), flat) === 1)
    assert(Kernels.nearestCentroidL2(fa(5f, 5f), flat) === 0) // tie → low id
    val r = Kernels.subCentroidF(fa(9f, 8f), flat, 1)
    assert(r.toFloatArray().toSeq === Seq(-1.0f, -2.0f))
    intercept[IllegalArgumentException](
      Kernels.nearestCentroidL2(fa(1f, 1f, 1f), flat)) // 4 % 3 != 0
    intercept[IllegalArgumentException](
      Kernels.subCentroidF(fa(1f, 1f), flat, 2)) // cell 2 of 2
  }

  test("pqEncodeF: per-division argmin codes") {
    // D=2, C=2, m=1; codebooks: div0 {0, 10}, div1 {5, -5}
    val cb = da(0.0, 10.0, 5.0, -5.0)
    val codes = Kernels.pqEncodeF(fa(9f, -4f), cb, 2, 2)
    assert(codes.toIntArray().toSeq === Seq(1, 1))
    assert(Kernels.pqEncodeF(fa(1f, 4f), cb, 2, 2).toIntArray().toSeq
      === Seq(0, 0))
    intercept[IllegalArgumentException](
      Kernels.pqEncodeF(fa(1f, 2f, 3f), cb, 2, 2)) // 3 % 2 != 0
  }

  test("sq8 codec: round-trip within half a step; guards on dim") {
    val mins = da(0.0, -1.0)
    val scales = da(0.1, 0.01)
    val v = fa(12.73f, 0.5f)
    val code = Kernels.sq8Encode(v, mins, scales)
    assert(code.length === 2)
    val dec = Kernels.sq8Decode(code, mins, scales)
    assert(math.abs(dec.getDouble(0) - 12.73) <= 0.05 + 1e-9)
    assert(math.abs(dec.getDouble(1) - 0.5) <= 0.005 + 1e-9)
    // clamping: values outside [min, min+255Δ] pin to the range ends
    assert((Kernels.sq8Encode(fa(-5f, 0f), mins, scales)(0) & 0xFF) === 0)
    assert((Kernels.sq8Encode(fa(99f, 0f), mins, scales)(0) & 0xFF) === 255)
    val d = Kernels.sq8Dist(da(12.73, 0.5), code, mins, scales)
    val manual = math.pow(12.73 - dec.getDouble(0), 2) +
      math.pow(0.5 - dec.getDouble(1), 2)
    assert(math.abs(d - manual) < 1e-12)
    intercept[IllegalArgumentException](
      Kernels.sq8Dist(da(1.0), code, mins, scales))
  }

  test("shingleRepetition: packed (max multiplicity, total)") {
    def unpack(p: Long): (Long, Long) = (p >>> 32, p & 0xFFFFFFFFL)
    assert(unpack(Kernels.shingleRepetition(
      sa("a", "b", "a", "b", "a", "b"), 2)) === ((3L, 5L))) // "a b" x3
    assert(unpack(Kernels.shingleRepetition(sa("x", "y"), 3)) === ((0L, 0L)))
    assert(unpack(Kernels.shingleRepetition(
      sa("p", "q", "r"), 3)) === ((1L, 1L)))
  }

  test("shingleHashes: positional, non-distinct, consistent with the set") {
    val toks = sa("a", "b", "a", "b", "c")
    val pos = Kernels.shingleHashes(toks, 2).toLongArray()
    assert(pos.length === 4) // 5 tokens, n=2
    // positions 0 and 2 are both "a b" — same hash, kept (non-distinct)
    assert(pos(0) === pos(2))
    // sorted-distinct of the positional hashes = the shingle SET
    assert(pos.distinct.sorted.toSeq ===
      Kernels.shingleHashesSorted(toks, 2).toLongArray().toSeq)
    // shorter than n => empty
    assert(Kernels.shingleHashes(sa("x"), 2).numElements() === 0)
  }

  test("hashEmbedF: counts sum to token count, order-invariant, dim guard") {
    val v = Kernels.hashEmbedF(sa("a", "b", "a"), 8)
    val arr = (0 until 8).map(v.getFloat)
    assert(arr.sum === 3f)
    assert(arr.max >= 2f) // "a" twice lands in one bucket
    // a permutation of the same multiset embeds identically
    val v2 = Kernels.hashEmbedF(sa("b", "a", "a"), 8)
    assert((0 until 8).map(v2.getFloat) === arr)
    // empty input -> zero vector of the right width
    val z = Kernels.hashEmbedF(sa(), 4)
    assert((0 until 4).map(z.getFloat).forall(_ === 0f))
    intercept[IllegalArgumentException](Kernels.hashEmbedF(sa("x"), 0))
  }

  test("norm2Safe: overflow-safe where plain squaring is Inf, else agrees") {
    def da(xs: Double*): ArrayData =
      UnsafeArrayData.fromPrimitiveArray(xs.toArray)
    // plain path: 1e200² = Inf; the √max|x|-scaled path stays finite
    val big = da(1e200, 0.0, -1e200)
    assert(java.lang.Double.isInfinite(1e200 * 1e200 + 1e200 * 1e200))
    assert(Kernels.norm2Safe(big) === 1e200 * math.sqrt(2.0))
    // subnormal floor: 1e-300² underflows to 0 in the plain form
    assert(1e-300 * 1e-300 === 0.0)
    assert(Kernels.norm2Safe(da(1e-300)) === 1e-300)
    // ordinary inputs agree with the direct form to 1 ulp
    val xs = Seq(3.0, -4.0, 12.0)
    val direct = math.sqrt(xs.map(x => x * x).sum)
    assert(math.abs(Kernels.norm2Safe(da(xs: _*)) - direct) <=
      math.ulp(direct))
    // empty and all-zero -> 0, as the reference
    assert(Kernels.norm2Safe(da()) === 0.0)
    assert(Kernels.norm2Safe(da(0.0, 0.0)) === 0.0)
    // NaN propagates (even all-NaN, which the max scan alone would
    // misreport as zero-norm); ±Inf -> +Inf
    assert(java.lang.Double.isNaN(Kernels.norm2Safe(da(Double.NaN))))
    assert(java.lang.Double.isNaN(Kernels.norm2Safe(da(Double.NaN, 1.0))))
    assert(Kernels.norm2Safe(da(1.0, Double.NegativeInfinity))
      === Double.PositiveInfinity)
  }

  test("norm2SafeF: float variant matches direct double computation") {
    assert(Kernels.norm2SafeF(fa(3f, 4f)) === 5.0)
    assert(Kernels.norm2SafeF(fa()) === 0.0)
    assert(Kernels.norm2SafeF(fa(0f)) === 0.0)
    // max-magnitude f32s: direct double form is exact; scaled agrees ~1 ulp
    val m = Float.MaxValue
    val direct = math.sqrt(2.0 * m.toDouble * m.toDouble)
    val got = Kernels.norm2SafeF(fa(m, -m))
    assert(math.abs(got - direct) <= 2 * math.ulp(direct))
  }

  test("bitsAboveMean: aHash bits, equal-input stability, size guard") {
    // [0,1,0,1]: mean 0.5 -> bits at positions 1 and 3
    assert(Kernels.bitsAboveMean(fa(0f, 1f, 0f, 1f)) === ((1L << 1) | (1L << 3)))
    // constant image: nothing exceeds the mean
    assert(Kernels.bitsAboveMean(fa(0.5f, 0.5f, 0.5f)) === 0L)
    // full 64-pixel image incl. the sign bit (pixel 63 above mean)
    val img = (0 until 64).map(i => if (i == 63) 1f else 0f)
    assert(Kernels.bitsAboveMean(fa(img: _*)) === Long.MinValue)
    intercept[IllegalArgumentException](Kernels.bitsAboveMean(fa()))
    intercept[IllegalArgumentException](
      Kernels.bitsAboveMean(fa((0 until 65).map(_.toFloat): _*)))
  }

  test("jaroWinkler: textbook values, DuckDB-pinned semantics (0.7 " +
      "boost threshold, integer transposition halving, empty -> 0)") {
    def jw(a: String, b: String): Double = Kernels.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    // jaro below the 0.7 threshold: NO prefix boost despite l=1
    assert(math.abs(jw("aXXXXX", "aYYYYY") - 0.4444444444444444) < 1e-12)
    // above threshold: boost with the 4-char prefix cap
    assert(math.abs(jw("prefix_same_tail1", "prefix_other")
      - 0.8336601307189542) < 1e-12)
    // odd out-of-order count halves by INTEGER division (DuckDB-pinned)
    assert(math.abs(jw("abcdef", "bcadef") - 0.9444444444444445) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "abc") === 0.0 && jw("", "") === 0.0)
    assert(jw("a", "b") === 0.0)
    // symmetric
    assert(jw("DIXON", "DICKSONX") === jw("DICKSONX", "DIXON"))
  }

  test("damerauLevenshtein: TRUE (unrestricted) semantics — edits may " +
      "cross a transposition, DuckDB-pinned") {
    def dl(a: String, b: String): Long = Kernels.damerauLevenshtein(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    // the OSA/restricted variant gives 3 for CA->ABC; true DL gives 2
    assert(dl("CA", "ABC") === 2L)
    assert(dl("abc", "ca") === 2L)
    assert(dl("ab", "ba") === 1L)
    assert(dl("kitten", "sitting") === 3L)
    assert(dl("abc", "abc") === 0L)
    assert(dl("", "abc") === 3L && dl("abc", "") === 3L && dl("", "") === 0L)
    // plain substitution/insert/delete degrade to levenshtein
    assert(dl("flaw", "lawn") === 2L)
    // symmetric
    assert(dl("CA", "ABC") === dl("ABC", "CA"))
  }

  test("clusteredVec: deterministic, in range, blobs are TIGHT relative " +
      "to cross-blob distances") {
    val dim = 32
    val k = 8
    def vec(id: Long) =
      Kernels.clusteredVec(id, dim, k, 0.25, 42L).toFloatArray()
    assert(vec(7L).toSeq === vec(7L).toSeq) // pure function of (id, seed)
    assert(vec(7L).forall(v => v >= -0.25f && v < 1.25f))
    def sq(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val vs = (0L until 256L).map(vec)
    val dists = for (i <- vs.indices; j <- (i + 1) until vs.length)
      yield sq(vs(i), vs(j))
    val sorted = dists.sorted
    // with 8 blobs, ~1/8 of pairs are same-blob: the bottom decile must
    // be far below the median (tight blobs), not a smooth continuum
    assert(sorted(sorted.length / 10) < sorted(sorted.length / 2) / 4,
      s"expected bimodal same/cross blob distances, got " +
        s"p10=${sorted(sorted.length / 10)} p50=${sorted(sorted.length / 2)}")
  }
}
