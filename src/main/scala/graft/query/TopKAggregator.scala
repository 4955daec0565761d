package graft.query

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k as a real aggregate — the scalable core of
  * batch k-NN (many queries at once, grouped by query id).
  *
  * A window `row_number() <= k` over (qid, dist) shuffles EVERY
  * (query, point) pair; this Aggregator is map-side combinable, so each
  * task keeps at most k candidates per query and the shuffle carries
  * k·|queries| rows no matter how large the point side is — the grouped
  * generalization of what `TakeOrderedAndProject` does for a single
  * query, and the same bounded-candidates idea as the reference's
  * `NBestByKey` (reference/src/nbest.rs:7-137) per partition + merge.
  *
  * The buffer keeps candidates sorted ascending (worst last); ties break
  * toward smaller id, matching ExactKnn.topK ordering.
  */
object TopKAggregator {

  final case class Cand(dist: Double, id: Long)
  final case class Buf(items: Seq[Cand])

  // (dist, id) order with java.lang.Double.compare — the same total order
  // the previous sortBy used (NaN last, -0.0 < 0.0), so results are
  // bit-identical to the sort-based implementation
  private def beforeOrAt(a: Cand, b: Cand): Boolean = {
    val c = java.lang.Double.compare(a.dist, b.dist)
    if (c != 0) c < 0 else a.id <= b.id
  }

  /** Binary-search insertion into a sorted bounded buffer — O(log k)
    * compares + one array copy, replacing the previous per-candidate
    * O(k log k) sortBy.take(k) allocation in the hottest reduce path. */
  private def insertOne(items: Seq[Cand], k: Int, a: Cand): Seq[Cand] = {
    val arr = items.toArray
    val n = arr.length
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (beforeOrAt(arr(mid), a)) lo = mid + 1 else hi = mid
    }
    if (lo >= k) items
    else {
      val m = math.min(n + 1, k)
      val out = new Array[Cand](m)
      System.arraycopy(arr, 0, out, 0, lo)
      out(lo) = a
      val tail = math.min(n - lo, m - lo - 1)
      if (tail > 0) System.arraycopy(arr, lo, out, lo + 1, tail)
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  /** Linear merge of two sorted buffers, bounded at k. */
  private def mergeSorted(x: Seq[Cand], y: Seq[Cand], k: Int): Seq[Cand] = {
    if (y.isEmpty) return x.take(k)
    if (x.isEmpty) return y.take(k)
    val xa = x.toArray
    val ya = y.toArray
    val m = math.min(xa.length + ya.length, k)
    val out = new Array[Cand](m)
    var i = 0
    var j = 0
    var o = 0
    while (o < m) {
      if (j >= ya.length || (i < xa.length && beforeOrAt(xa(i), ya(j)))) {
        out(o) = xa(i); i += 1
      } else {
        out(o) = ya(j); j += 1
      }
      o += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  private class TopK(k: Int) extends Aggregator[Cand, Buf, Buf] {
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Cand): Buf =
      // fast path: full buffer and the candidate is no better than the worst
      if (b.items.length == k && {
        val w = b.items.last
        a.dist > w.dist || (a.dist == w.dist && a.id > w.id)
      }) b
      else Buf(insertOne(b.items, k, a))
    override def merge(x: Buf, y: Buf): Buf = Buf(mergeSorted(x.items, y.items, k))
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** topK(k)(distCol, idCol) → array<struct<dist,id>> ascending, ≤ k rows.
    * Backed by the NATIVE [[BoundedTopK]] aggregate since round 8 — the
    * udaf Aggregator's per-row encoder (a case class + immutable buffer
    * per input row) measured 13% of a 50M-row batch-ANN scan's wall
    * (5.53 → 4.83 s same-box A/B). Same output shape and bit-identical
    * ordering; [[topKUdaf]] is kept as the differential oracle
    * (TopKAggregatorSpec). */
  def topK(k: Int)(dist: Column, id: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(BoundedTopK(k,
      ColumnShim.expression(dist.cast("double")),
      ColumnShim.expression(id.cast("long")))
      .toAggregateExpression())
  }

  /** The previous udaf-based implementation — retained as the
    * equivalence oracle for the native aggregate. */
  private[graft] def topKUdaf(k: Int)(dist: Column, id: Column): Column =
    udaf(new TopK(k), Encoders.product[Cand]).apply(dist, id).getField("items")
}
