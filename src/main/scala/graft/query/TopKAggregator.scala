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

  private def insert(buf: Seq[Cand], k: Int, extra: Seq[Cand]): Seq[Cand] =
    (buf ++ extra).sortBy(c => (c.dist, c.id)).take(k)

  private class TopK(k: Int) extends Aggregator[Cand, Buf, Buf] {
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Cand): Buf =
      // fast path: full buffer and the candidate is no better than the worst
      if (b.items.length == k && {
        val w = b.items.last
        a.dist > w.dist || (a.dist == w.dist && a.id > w.id)
      }) b
      else Buf(insert(b.items, k, a :: Nil))
    override def merge(x: Buf, y: Buf): Buf = Buf(insert(x.items, k, y.items))
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** topK(k)(distCol, idCol) → array<struct<dist,id>> ascending, ≤ k rows. */
  def topK(k: Int)(dist: Column, id: Column): Column =
    udaf(new TopK(k), Encoders.product[Cand]).apply(dist, id).getField("items")
}
