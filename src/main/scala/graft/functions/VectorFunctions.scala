package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector kernels over `array<float>` columns.
  *
  * Re-expresses the reference's linalg kernels (reference/src/linalg.rs:12-247:
  * dot, norm2, subtract, scale, sum) as Spark SQL higher-order functions.
  * These compile into whole-stage codegen — the JIT'd loop over the array is
  * the moral equivalent of the reference's unrolled-by-16 scalar loops
  * (reference/src/linalg.rs:7), except it runs on every executor core over
  * columnar parquet batches instead of one thread.
  *
  * All arithmetic is widened to Double: (a) Spark's float sums would drift
  * from any SQL oracle, (b) the reference accumulates distances in the
  * element type but our contract is distance *ordering*, which Double
  * preserves better at 1536 dims.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Σ xᵢ·yᵢ — reference `dot` (linalg.rs:12-53). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** Σ (xᵢ−yᵢ)² — squared Euclidean distance, the reference's only distance
    * metric (used via `subtract` + `dot`, db/stored.rs:420-427). */
  def squaredL2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (acc, v) => acc + v)

  /** Σ xᵢ² — squared norm. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + d(v) * d(v))

  /** ‖x‖₂ — reference `norm2` (linalg.rs:61-146). This HOF form squares
    * directly (exact for all f32 inputs in a double accumulator and
    * oracle-locked by the cosine entries); the reference's √max|x|
    * pre-scaled variant — safe for double inputs beyond ~1e154 — is
    * [[FastFunctions.norm2Safe]]/[[FastFunctions.norm2SafeF]]
    * (`graft_norm2` in SQL). */
  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity dot/(‖a‖·‖b‖); 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Element-wise a−b — reference `subtract` (linalg.rs:160-171). */
  def vecSub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)

  /** Element-wise a+b — reference `add_in` (linalg.rs:149-157); used to
    * reconstruct vectors from residual + centroid (partitions.rs:38-93). */
  def vecAdd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** x·s — reference `scale_in` (linalg.rs:188-203). */
  def vecScale(a: Column, s: Column): Column = transform(a, x => x * s)

  /** Subvector `d` of `numDivisions` equal slices — reference
    * `divide_vector_set` (vector.rs:154-174). Requires dim % numDivisions == 0,
    * validated by the caller (same contract as vector.rs:162-168).
    * `slice` is 1-based. */
  def subvector(v: Column, division: Int, numDivisions: Int, dim: Int): Column = {
    require(dim % numDivisions == 0,
      s"vector size $dim not divisible into $numDivisions divisions")
    val m = dim / numDivisions
    slice(v, division * m + 1, m)
  }

  /** Array[Float] literal column for a query vector. */
  def vecLit(q: Seq[Float]): Column = typedlit(q)
}
