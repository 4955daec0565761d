package graft.query

import graft.index.IvfPqModel

/** Cell-sharded warm serving: N cell-disjoint [[LocalServe]] shards
  * behind one top-k merge — the executable form of the serving-tier
  * contract ("a box serves the cells it holds, a fleet shards cells
  * across boxes", [[LocalServe]] scaladoc) and the throughput lever the
  * round-12 OPQ A/B measured out (BENCH_NOTES: one box's ~1.5k QPS OPQ
  * ceiling is aggregate compute/bandwidth — more arithmetic only comes
  * from more boxes).
  *
  * Routing: one probe selection per query ([[AnnQuery.selectPartitions]]
  * — driver arithmetic over the model's P centroids, identical to the
  * single-box path), then each probed (cell, localized) pair routes to
  * the unique shard holding that cell and every shard answers its
  * subset through [[LocalServe.queryProbes]] — byte-for-byte the
  * single-box ADC loop over fewer cells. The merge re-applies the
  * global (sq_dist, id) order over the ≤ shards·k candidates.
  *
  * Bit-parity argument (spec'd in ServeRouterSpec and gated by
  * `ann_serve_sharded`): each probe's ADC table is a pure function of
  * (model, localized query), so a cell scores identically on any
  * shard; every member of the true global top-k is, a fortiori, in its
  * own shard's top-k; and both tiers break ties by (sq_dist, id) — so
  * sort-merge of the per-shard top-k equals the single-box top-k
  * exactly, bit for bit.
  *
  * IN THIS PROCESS the shards share one set of arithmetic units, so the
  * router adds no throughput here (measured, BENCH_NOTES r13) — its QPS
  * claim is for shard JVMs on separate boxes, where each holds 1/N of
  * the residency and contributes its own memory bandwidth. The routing
  * and merge layer is what this class makes real and testable; it is
  * deliberately synchronous per shard call so a remote transport can
  * wrap `shards` without changing the merge. */
final class ServeRouter private (
    val model: IvfPqModel,
    shards: IndexedSeq[LocalServe],
    cellShard: Map[Int, Int]) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm top-k across the shard fleet: identical contract and bits to
    * a single [[LocalServe]] holding every shard's cells. Probed cells
    * no shard holds throw, the fleet-level form of the single-box
    * refusal contract. */
  def query(q: Array[Double], k: Int, nprobe: Int)
      : Array[(Long, Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes = AnnQuery.selectPartitions(model, q, nprobe)
    val missing = probes.map(_._1).filterNot(cellShard.contains)
    require(missing.isEmpty,
      s"probed cells not resident on any shard: ${missing.mkString(",")}")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val byShard = probes.groupBy { case (cell, _) => cellShard(cell) }
    val futs = byShard.toSeq.map { case (si, shardProbes) =>
      Future(shards(si).queryProbes(shardProbes, k))
    }
    val merged = Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
    // k-sized merge: every true global top-k member is in its shard's
    // top-k, and both tiers order by (sq_dist, id)
    merged.sortBy(t => (t._3, t._1)).take(k)
  }
}

object ServeRouter {

  /** Assemble a router over cell-disjoint shards. Shards must not
    * overlap (two copies of a cell would double-count its candidates);
    * coverage of ALL the model's cells is NOT required — a probe into
    * an unheld cell throws at query time, exactly the single-box
    * refusal. */
  def apply(model: IvfPqModel, shards: Seq[LocalServe]): ServeRouter = {
    require(shards.nonEmpty, "router needs at least one shard")
    val pairs = shards.zipWithIndex.flatMap { case (s, i) =>
      s.cells.map(_ -> i)
    }
    val dup = pairs.groupBy(_._1).filter(_._2.length > 1).keys
    require(dup.isEmpty,
      s"cells held by more than one shard: ${dup.toSeq.sorted.mkString(",")}")
    new ServeRouter(model, shards.toIndexedSeq, pairs.toMap)
  }
}

/** Cell-ASSIGNED router over LAZY shards — the fleet form of the lazy
  * tier: a static cell→shard assignment (not the shards' current
  * residency, which is dynamic by design) routes each probed cell to
  * its one owner, and every shard is a [[LocalServeLazy]] that pins its
  * assigned cells on first probe under its own caps. N boxes together
  * hold the hot fraction of a store NONE of them could pin alone;
  * results stay bit-identical to a single box over the same store
  * (the [[ServeRouter]] merge argument — per-probe ADC tables are pure
  * functions of (model, localized), per-shard top-k keeps every true
  * global member, both tiers break ties by (sq_dist, id)).
  *
  * The assignment must cover every cell a query can probe (a probe
  * into an unassigned cell throws — the fleet refusal contract);
  * typically `cell % numShards`. Shards opened with caps keep their
  * own LRU/bytes eviction — the router adds no residency state. */
final class ServeRouterLazy private (
    val model: IvfPqModel,
    shards: IndexedSeq[LocalServeLazy],
    assign: Int => Int) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm-or-cold top-k across the lazy fleet: identical contract and
    * bits to one [[LocalServeLazy]] holding every cell. */
  def query(q: Array[Double], k: Int, nprobe: Int)
      : Array[(Long, Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes = AnnQuery.selectPartitions(model, q, nprobe)
    val bad = probes.map(_._1).filter { c =>
      val s = assign(c); s < 0 || s >= shards.length
    }
    require(bad.isEmpty,
      s"probed cells assigned to no shard: ${bad.mkString(",")}")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val byShard = probes.groupBy { case (cell, _) => assign(cell) }
    val futs = byShard.toSeq.map { case (si, shardProbes) =>
      Future(shards(si).queryProbes(shardProbes, k))
    }
    val merged = Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
    merged.sortBy(t => (t._3, t._1)).take(k)
  }
}

object ServeRouterLazy {

  /** Assemble a lazy fleet router from shards (one per assignment
    * index) and a static cell→shard assignment. */
  def apply(model: IvfPqModel, shards: Seq[LocalServeLazy],
            assign: Int => Int): ServeRouterLazy = {
    require(shards.nonEmpty, "router needs at least one shard")
    new ServeRouterLazy(model, shards.toIndexedSeq, assign)
  }
}
