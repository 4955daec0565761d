package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FastFunctions.litLongs

/** Bloom-filter semi-join reduction — the runtime-filter technique for
  * joins whose build side is selective but too large for the probe side
  * to broadcast-join cheaply everywhere it is scanned: build an m-bit
  * Bloom filter over the build keys (one distributed pass, fixed-width
  * partials), ship it as a plan literal, and pre-filter the probe side
  * BEFORE its shuffle — false positives only, never false negatives, so
  * the real join downstream stays exact while moving a fraction of the
  * rows. (Spark's own `spark.sql.optimizer.runtime.bloomFilter` applies
  * the same idea automatically inside one query; this operator makes the
  * filter a first-class value that can be built once and applied across
  * queries/stages — e.g. probe-side pruning for an incremental pipeline.)
  *
  * Scale shape: the build explodes k (word, bitmask) rows per key and
  * bit_or-combines map-side, so the shuffle carries at most m/64 longs
  * per upstream partition regardless of key count; the finished filter is
  * m/64 longs on the driver (1 MiB per 8M bits). The probe check is a
  * pure codegen projection — k × (xxhash64 + shift + mask) against the
  * literal word array, no shuffle, no join.
  */
object BloomJoin {

  /** Size m (bits, rounded up to a multiple of 64) for an expected key
    * count at ~16 bits/key — with k=3 hashes the false-positive rate is
    * (1 − e^(−3/16))³ ≈ 0.5%. */
  def sizeFor(numKeys: Long): Int = {
    val bits = math.max(64L, numKeys * 16L)
    (((bits + 63) / 64) * 64).min(1L << 30).toInt
  }

  /** Build the filter: Array[Long] of m/64 words. One job. */
  def buildBits(df: DataFrame, keyCol: String, mBits: Int,
                numHashes: Int = 3): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a multiple of 64")
    require(numHashes >= 1 && numHashes <= 8, "1 <= numHashes <= 8")
    val entries = (0 until numHashes).map { i =>
      val p = pmod(xxhash64(col(keyCol), lit(i)), lit(mBits.toLong))
      struct(shiftright(p, 6).as("w"),
        call_function("shiftleft", lit(1L),
          p.bitwiseAND(lit(63L)).cast("int")).as("m"))
    }
    val words = df
      .select(explode(array(entries: _*)).as("e"))
      .groupBy(col("e.w").as("w"))
      .agg(bit_or(col("e.m")).as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership test column: true for every inserted key, true with
    * probability ≈ fp-rate for foreign keys. Codegen-only expression
    * against the broadcast-literal word array. */
  def mightContain(key: Column, bits: Array[Long],
                   numHashes: Int = 3): Column = {
    val mBits = bits.length * 64L
    val words = litLongs(bits)
    (0 until numHashes).map { i =>
      val p = pmod(xxhash64(key, lit(i)), lit(mBits))
      element_at(words, (shiftright(p, 6) + 1L).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          p.bitwiseAND(lit(63L)).cast("int")))
        .=!=(lit(0L))
    }.reduce(_ && _)
  }

  /** Convenience: probe rows surviving the filter built from the build
    * side's keys — the reduced input to the exact downstream join. */
  def reduceProbe(probe: DataFrame, probeKey: String,
                  build: DataFrame, buildKey: String,
                  numHashes: Int = 3): DataFrame = {
    val n = build.select(buildKey).count()
    val bits = buildBits(build, buildKey, sizeFor(n), numHashes)
    probe.where(mightContain(col(probeKey), bits, numHashes))
  }
}
