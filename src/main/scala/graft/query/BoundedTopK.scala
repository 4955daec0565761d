package graft.query

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable bounded top-k state: two primitive arrays, sorted ascending
  * by (dist, id), worst candidate last. No per-row allocation — the
  * whole point of the native aggregate vs the udaf Aggregator, whose
  * encoder materialized a case class + immutable buffer per input row
  * (measured ~half the wall of a 50M-row batch-ANN scan). */
final class TopKState(val k: Int) {
  val dists = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  // (dist, id) total order via java.lang.Double.compare — NaN last,
  // -0.0 < 0.0, ties toward the smaller id; identical to the previous
  // udaf implementation so results are bit-compatible
  private def beforeOrAt(d1: Double, i1: Long, d2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    if (c != 0) c < 0 else i1 <= i2
  }

  def insert(d: Double, id: Long): Unit = {
    // fast path: full and no better than the worst (primitive compares,
    // matching the udaf's short-circuit exactly)
    if (n == k) {
      val wd = dists(n - 1)
      if (d > wd || (d == wd && id > ids(n - 1))) return
    }
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (beforeOrAt(dists(mid), ids(mid), d, id)) lo = mid + 1 else hi = mid
    }
    if (lo >= k) return
    val tail = math.min(n - lo, k - lo - 1)
    if (tail > 0) {
      System.arraycopy(dists, lo, dists, lo + 1, tail)
      System.arraycopy(ids, lo, ids, lo + 1, tail)
    }
    dists(lo) = d
    ids(lo) = id
    if (n < k) n += 1
  }

  /** Linear merge of two sorted states into a fresh bounded state. */
  def mergedWith(o: TopKState): TopKState = {
    if (o.n == 0) return this
    if (n == 0) return o
    val out = new TopKState(k)
    val m = math.min(n + o.n, k)
    var i = 0
    var j = 0
    var w = 0
    while (w < m) {
      if (j >= o.n ||
          (i < n && beforeOrAt(dists(i), ids(i), o.dists(j), o.ids(j)))) {
        out.dists(w) = dists(i); out.ids(w) = ids(i); i += 1
      } else {
        out.dists(w) = o.dists(j); out.ids(w) = o.ids(j); j += 1
      }
      w += 1
    }
    out.n = m
    out
  }
}

/** Bounded per-group top-k as a NATIVE TypedImperativeAggregate — the
  * map-side-combinable core of batch k-NN (see [[TopKAggregator]] for
  * the algorithmic contract: at most k candidates per group per task,
  * k·|groups| rows through the shuffle, the grouped generalization of
  * `TakeOrderedAndProject` and of the reference's `NBestByKey`,
  * reference/src/nbest.rs:7-137). Native because the hot path is
  * per-scanned-row: `update` reads the two child expressions straight
  * off the InternalRow into primitive arrays — no encoder, no case
  * class, no immutable buffer churn. Rows with a NULL distance or id
  * are ignored (the udaf predecessor rejected them at the encoder).
  * Output: array<struct<dist double, id bigint>> ascending, ≤ k rows —
  * identical shape and order to the udaf it replaces. */
case class BoundedTopK(k: Int, left: Expression, right: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] with BinaryLike[Expression] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("dist", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(state: TopKState, input: InternalRow): TopKState = {
    val d = left.eval(input)
    val i = right.eval(input)
    if (d != null && i != null)
      state.insert(d.asInstanceOf[Double], i.asInstanceOf[Long])
    state
  }

  override def merge(a: TopKState, b: TopKState): TopKState = a.mergedWith(b)

  override def eval(state: TopKState): Any = {
    val rows = new Array[Any](state.n)
    var i = 0
    while (i < state.n) {
      rows(i) = new GenericInternalRow(
        Array[Any](state.dists(i), state.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(state: TopKState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + state.n * 16)
    bb.putInt(state.n)
    var i = 0
    while (i < state.n) {
      bb.putDouble(state.dists(i)); bb.putLong(state.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new TopKState(k)
    s.n = bb.getInt()
    var i = 0
    while (i < s.n) {
      s.dists(i) = bb.getDouble(); s.ids(i) = bb.getLong(); i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bounded_top_k"
}
