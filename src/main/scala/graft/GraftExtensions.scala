package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

import graft.functions.Kernels

/** SQL surface for the graft kernels: `spark.sql("SELECT graft_cosine(a,
  * b) ...")`. Register either at session build via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or on a
  * live session with [[GraftFunctions.register]]. Each function is the
  * same codegen'd StaticInvoke the Column API uses — one registry, two
  * front doors.
  */
object GraftFunctions {

  /** (name, return type, kernel method, arity) — arity checked at parse. */
  private val specs: Seq[(String, DataType, String, Int)] = Seq(
    ("graft_sq_l2", DoubleType, "sqL2f", 2),
    ("graft_dot", DoubleType, "dotf", 2),
    ("graft_cosine", DoubleType, "cosinef", 2),
    ("graft_norm2", DoubleType, "norm2SafeF", 1),
    ("graft_norm2_d", DoubleType, "norm2Safe", 1),
    ("graft_hash_embed", ArrayType(FloatType, containsNull = false),
      "hashEmbedF", 2),
    ("graft_token_hashes", ArrayType(LongType, containsNull = false),
      "tokenHashesSorted", 1),
    ("graft_inter_size", LongType, "interSortedSize", 2),
    ("graft_minhash", ArrayType(LongType, containsNull = false), "minhashSig", 2),
    ("graft_minhash_oph", ArrayType(LongType, containsNull = false), "minhashSigOPH", 2),
    ("graft_band_keys", ArrayType(LongType, containsNull = false), "bandKeys", 2),
    ("graft_simhash", LongType, "simhash64", 1),
    ("graft_byte_bucket_sums", ArrayType(LongType, containsNull = false),
      "byteBucketSums", 2),
    ("graft_frame_sums", ArrayType(LongType, containsNull = false),
      "sampledFrameSums", 3),
    ("graft_random_vec", ArrayType(FloatType, containsNull = false),
      "pseudoRandomVec", 3),
    ("graft_shingle_hashes", ArrayType(LongType, containsNull = false),
      "shingleHashesSorted", 2),
    ("graft_shingle_hashes_pos", ArrayType(LongType, containsNull = false),
      "shingleHashes", 2),
    ("graft_ahash_bits", LongType, "bitsAboveMean", 1),
    ("graft_first_common", LongType, "firstCommon", 2),
    ("graft_first_equal_idx", IntegerType, "firstEqualIdx", 2),
    ("graft_pq_dist", DoubleType, "pqDistDirect", 4),
    ("graft_nearest_centroid", IntegerType, "nearestCentroidL2", 2),
    ("graft_sub_centroid", ArrayType(FloatType, containsNull = false),
      "subCentroidF", 3),
    ("graft_pq_encode", ArrayType(IntegerType, containsNull = false),
      "pqEncodeF", 4),
    ("graft_pq_reconstruct", ArrayType(FloatType, containsNull = false),
      "pqReconstructF", 4),
    ("graft_sq8_encode", BinaryType, "sq8Encode", 3),
    ("graft_sq8_decode", ArrayType(DoubleType, containsNull = false),
      "sq8Decode", 3),
    ("graft_sq8_dist", DoubleType, "sq8Dist", 4),
    ("graft_shingle_repetition", LongType, "shingleRepetition", 2),
    ("graft_moments_upper", ArrayType(DoubleType, containsNull = false),
      "momentsUpper", 1),
    ("graft_matvec_rows", ArrayType(DoubleType, containsNull = false),
      "matvecRows", 2),
    ("graft_rotate", ArrayType(FloatType, containsNull = false),
      "rotateF", 2),
    ("graft_sign_bits", ArrayType(LongType, containsNull = false),
      "signBits", 2),
    ("graft_hamming", IntegerType, "hammingDist", 2),
    ("graft_top_cells", ArrayType(LongType, containsNull = false),
      "topCellsL2", 3),
    ("graft_last_le_idx", IntegerType, "lastLeIdx", 2),
    ("graft_adc_dist", DoubleType, "adcDist", 3),
    ("graft_mean_pool", ArrayType(FloatType, containsNull = false),
      "meanPool", 5),
    ("graft_nfc", StringType, "nfcNormalize", 1),
    ("graft_nfkc", StringType, "nfkcNormalize", 1),
    ("graft_deflate_len", LongType, "deflateLen", 1),
    ("graft_strip_accents", StringType, "stripAccents", 1))

  /** The advertised SQL surface, in registration order. Every kernel
    * with stable semantics is here; the only deliberate omission is
    * `stubDecodeGray` (a documented TEST SEAM for the multimodal decode
    * boundary, not an operator — see Multimodal.scala). Pipeline
    * OPERATORS (dedup, SCD2, sampling, BPE…) stay Scala-API-only by
    * design: they are multi-stage plans with tuning contracts, not
    * scalar functions — the README's SQL-surface table records the
    * split. */
  def names: Seq[String] = specs.map(_._1)

  private def builder(name: String, dt: DataType, method: String, arity: Int)
      (args: Seq[Expression]): Expression = {
    require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
    // declared input types make analysis reject (or coerce) mistyped SQL
    // arguments instead of reinterpreting bytes at runtime
    StaticInvoke(Kernels.getClass, dt, method, args,
      inputTypes = graft.functions.FastFunctions.kernelInputTypes
        .getOrElse(method, Nil),
      propagateNull = true, returnNullable = false)
  }

  def inject(ext: SparkSessionExtensions): Unit =
    specs.foreach { case (name, dt, method, arity) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(Kernels.getClass.getName, name),
        builder(name, dt, method, arity) _))
    }

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    specs.foreach { case (name, dt, method, arity) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder(name, dt, method, arity) _, "built-in")
    }
}

/** Entry point for `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
