package graft.query

import graft.index.IvfPqModel

/** Cell-sharded warm serving: N cell-disjoint [[PqShard]]s behind one
  * top-k merge — the executable form of the serving-tier contract ("a
  * box serves the cells it holds, a fleet shards cells across boxes",
  * [[LocalServe]] scaladoc) and the throughput lever the round-12 OPQ
  * A/B measured out (BENCH_NOTES: one box's ~1.5k QPS OPQ ceiling is
  * aggregate compute/bandwidth — more arithmetic only comes from more
  * boxes).
  *
  * Routing: one probe selection per query ([[AnnQuery.selectPartitions]]
  * — driver arithmetic over the model's P centroids, identical to the
  * single-box path), then each probed (cell, localized) pair routes to
  * the unique shard holding that cell and every shard answers its
  * subset through [[PqShard.queryProbes]] — byte-for-byte the
  * single-box ADC loop over fewer cells. The merge re-applies the
  * global (sq_dist, id) order over the ≤ shards·k candidates
  * ([[ShardFan.mergeTopK]] — the rule lives once for every family).
  *
  * Bit-parity argument (spec'd in ServeRouterSpec and gated by
  * `ann_serve_sharded`): each probe's ADC table is a pure function of
  * (model, localized query), so a cell scores identically on any
  * shard; every member of the true global top-k is, a fortiori, in its
  * own shard's top-k; and both tiers break ties by (sq_dist, id) — so
  * sort-merge of the per-shard top-k equals the single-box top-k
  * exactly, bit for bit.
  *
  * Shards are behind the [[PqShard]] trait: in this process
  * ([[LocalServe]], where the router adds no throughput — the shards
  * share one set of arithmetic units, measured, BENCH_NOTES r13) or
  * across a process boundary ([[RemoteShards.pq]], each shard JVM
  * contributing its own memory bandwidth and holding 1/N residency).
  * The per-shard call is deliberately synchronous so the transport
  * wraps `shards` without changing the merge. */
final class ServeRouter private (
    val model: IvfPqModel,
    shards: IndexedSeq[PqShard],
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
    ShardFan.mergeTopK(
      ShardFan.fanOut(probes, c => cellShard.getOrElse(c, -1), shards.length,
        (si, sp) => shards(si).queryProbes(sp, k)),
      k)
  }

  /** FILTERED top-k across the fleet — [[LocalServe.queryFiltered]]'s
    * contract sharded: the predicate narrows candidates INSIDE each
    * shard's ADC loop (per row, before the heap), so the per-shard
    * top-k is the filtered top-k of its cells and the same merge
    * argument applies verbatim. Every shard must have pinned attrs. */
  def queryFiltered(q: Array[Double], k: Int, nprobe: Int)
                   (pred: Long => Boolean): Array[(Long, Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shards.forall(_.attrsPinned),
      "fleet queryFiltered needs attributes pinned on EVERY shard — " +
        "load shards via fromCodesWithAttrs")
    val probes = AnnQuery.selectPartitions(model, q, nprobe)
    ShardFan.mergeTopK(
      ShardFan.fanOut(probes, c => cellShard.getOrElse(c, -1), shards.length,
        (si, sp) => shards(si).queryProbes(sp, k, pred)),
      k)
  }
}

object ServeRouter {

  /** Assemble a router over cell-disjoint shards. Shards must not
    * overlap (two copies of a cell would double-count its candidates);
    * coverage of ALL the model's cells is NOT required — a probe into
    * an unheld cell throws at query time, exactly the single-box
    * refusal. */
  def apply(model: IvfPqModel, shards: Seq[PqShard]): ServeRouter = {
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
    shards: IndexedSeq[PqShard],
    assign: Int => Int) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm-or-cold top-k across the lazy fleet: identical contract and
    * bits to one [[LocalServeLazy]] holding every cell. */
  def query(q: Array[Double], k: Int, nprobe: Int)
      : Array[(Long, Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes = AnnQuery.selectPartitions(model, q, nprobe)
    ShardFan.mergeTopK(
      ShardFan.fanOut(probes, assign, shards.length,
        (si, sp) => shards(si).queryProbes(sp, k)),
      k)
  }

  /** FILTERED top-k across the lazy fleet — every shard must be opened
    * via [[LocalServeLazy.fromCodesWithAttrs]] (attrs pin per cell with
    * the codes); the predicate narrows inside each shard's loop, so the
    * [[ServeRouter.queryFiltered]] merge argument carries over. */
  def queryFiltered(q: Array[Double], k: Int, nprobe: Int)
                   (pred: Long => Boolean): Array[(Long, Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shards.forall(_.attrsPinned),
      "fleet queryFiltered needs attributes pinned on EVERY shard — " +
        "open shards via fromCodesWithAttrs")
    val probes = AnnQuery.selectPartitions(model, q, nprobe)
    ShardFan.mergeTopK(
      ShardFan.fanOut(probes, assign, shards.length,
        (si, sp) => shards(si).queryProbes(sp, k, pred)),
      k)
  }

  /** Fleet warm-up: route `cells` to their owners and prefetch each
    * shard's subset CONCURRENTLY — each lazy shard runs its one
    * shared-promise load pass ([[LazyResidency.prefetch]]: warm
    * traffic unblocked, caps honored, a concurrently queried cell
    * still loads once); in-process and remote ([[RemoteShards.Pq]])
    * shards both answer it. Blocks until every shard's pass returns. */
  def prefetch(cells: Seq[Int]): Unit =
    ShardFan.fanPrefetch(cells, assign, shards.length,
      (si, cs) => shards(si).prefetchCells(cs))
}

object ServeRouterLazy {

  /** Assemble a lazy fleet router from shards (one per assignment
    * index) and a static cell→shard assignment. */
  def apply(model: IvfPqModel, shards: Seq[PqShard],
            assign: Int => Int): ServeRouterLazy = {
    require(shards.nonEmpty, "router needs at least one shard")
    new ServeRouterLazy(model, shards.toIndexedSeq, assign)
  }
}

/** [[ServeRouter]] for IVF+SQ8 shards — identical routing and merge
  * over [[Sq8Shard.queryProbes]]; the per-row sq8 distance is a
  * pure function of (codec constants, localized query, row), so the
  * merge argument carries over unchanged. */
final class ServeRouterSq8 private (
    val model: graft.index.IvfSq8Model,
    shards: IndexedSeq[Sq8Shard],
    cellShard: Map[Int, Int]) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm top-k across the fleet — bit-identical to a single
    * [[LocalServeSq8]] holding every shard's cells. */
  def query(q: Array[Double], k: Int, nprobe: Int)
      : Array[(Long, Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes = graft.index.IvfSq8.selectPartitions(model, q, nprobe)
    ShardFan.mergeTopK(
      ShardFan.fanOut(probes, c => cellShard.getOrElse(c, -1), shards.length,
        (si, sp) => shards(si).queryProbes(sp, k)),
      k)
  }
}

object ServeRouterSq8 {

  /** Assemble over cell-disjoint SQ8 shards — same contract as
    * [[ServeRouter.apply]]. */
  def apply(model: graft.index.IvfSq8Model,
            shards: Seq[Sq8Shard]): ServeRouterSq8 = {
    require(shards.nonEmpty, "router needs at least one shard")
    val pairs = shards.zipWithIndex.flatMap { case (s, i) =>
      s.cells.map(_ -> i)
    }
    val dup = pairs.groupBy(_._1).filter(_._2.length > 1).keys
    require(dup.isEmpty,
      s"cells held by more than one shard: ${dup.toSeq.sorted.mkString(",")}")
    new ServeRouterSq8(model, shards.toIndexedSeq, pairs.toMap)
  }
}

/** [[ServeRouter]] for two-level RQ shards — the refine pattern needs
  * the TWO-PHASE merge: a naive merge of per-shard REFINED top-k is not
  * bit-equal to the single box, because a shard-local nominee that the
  * single box's GLOBAL level-1 cut (top k·kFactor by (lvl1, id)) would
  * have dropped can refine well and enter the merged top-k — better
  * recall, different bits. So each shard returns its level-1 top-n
  * nominees WITH BOTH scores ([[RqShard.nomineesScored]]), and
  * [[ShardFan.mergeTwoPhase]] re-applies the global level-1 order to
  * reconstruct the single box's nomination set exactly before the
  * refined (sq_dist, id) order. Both scores are pure functions of
  * (model, q, row), so shard-local computation cannot change them. */
final class ServeRouterRq private (
    val model: graft.index.Rq.RqModel,
    shards: IndexedSeq[RqShard],
    cellShard: Map[Int, Int]) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm refined top-k across the fleet — bit-identical to a single
    * [[LocalServeRq]] holding every shard's cells. */
  def query(q: Array[Double], k: Int, nprobe: Int,
            kFactor: Int = 4): Array[(Long, Double)] = {
    require(k >= 1 && kFactor >= 1, s"bad k=$k / kFactor=$kFactor")
    val probes = AnnQuery.selectPartitions(model.base, q, nprobe)
    val n = k * kFactor
    val nominees =
      ShardFan.fanOut(probes, c => cellShard.getOrElse(c, -1), shards.length,
        (si, sp) => shards(si).nomineesScored(sp, q, n))
    ShardFan.mergeTwoPhase(nominees.map(t => (t._1, t._3, t._4)), n, k)
  }
}

object ServeRouterRq {

  /** Assemble over cell-disjoint RQ shards — same contract as
    * [[ServeRouter.apply]]. */
  def apply(model: graft.index.Rq.RqModel,
            shards: Seq[RqShard]): ServeRouterRq = {
    require(shards.nonEmpty, "router needs at least one shard")
    val pairs = shards.zipWithIndex.flatMap { case (s, i) =>
      s.cells.map(_ -> i)
    }
    val dup = pairs.groupBy(_._1).filter(_._2.length > 1).keys
    require(dup.isEmpty,
      s"cells held by more than one shard: ${dup.toSeq.sorted.mkString(",")}")
    new ServeRouterRq(model, shards.toIndexedSeq, pairs.toMap)
  }
}

/** [[ServeRouter]] for Hamming-signature shards. Signatures have no
  * cells — shards split the corpus by ID (any disjoint split works; the
  * scan is flat) — so EVERY shard answers every query and the merge is
  * over all shards' top-k by (hamming, id). The rerank composition uses
  * the same two-phase merge as [[ServeRouterRq]]: shards return their
  * Hamming top-n nominees with both scores
  * ([[HammingShard.rerankCandidates]]), the router re-applies the
  * global Hamming nomination cut, then the exact (sq_dist, id) order —
  * bit-identical to the single box's nominate-then-rerank. */
final class ServeRouterHamming private (
    shards: IndexedSeq[HammingShard]) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm Hamming top-k across the fleet — bit-identical to a single
    * [[LocalServeHamming]] holding every shard's rows. */
  def query(q: Array[Float], k: Int): Array[(Long, Long)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    ShardFan.fanOutAll(shards)(_.query(q, k))
      .sortBy(t => (t._2, t._1)).take(k)
  }

  /** Hamming-nominate + exact re-rank across the fleet — bit-identical
    * to the single box's [[LocalServeHamming.queryRerank]] (two-phase
    * merge; every shard must have floats pinned). */
  def queryRerank(q: Array[Float], k: Int,
                  kFactor: Int = 4): Array[(Long, Double)] = {
    require(k >= 1 && kFactor >= 1, s"bad k=$k / kFactor=$kFactor")
    val n = k * kFactor
    val nominees = ShardFan.fanOutAll(shards)(_.rerankCandidates(q, n))
    ShardFan.mergeTwoPhase(nominees, n, k)
  }
}

object ServeRouterHamming {

  /** Assemble over ID-disjoint signature shards (overlap would
    * double-count candidates — checked at assembly; shard sizes are
    * driver-resident by the serving contract, so the check is cheap). */
  def apply(shards: Seq[HammingShard]): ServeRouterHamming = {
    require(shards.nonEmpty, "router needs at least one shard")
    val seen = new java.util.HashSet[Long]()
    shards.foreach { s =>
      s.idsSnapshot.foreach { id =>
        require(seen.add(id), s"id $id held by more than one shard")
      }
    }
    new ServeRouterHamming(shards.toIndexedSeq)
  }
}

/** [[ServeRouterLazy]] for IVF+SQ8 lazy shards — static assignment,
  * per-shard lazy pinning under each shard's own caps, identical merge
  * to [[ServeRouterSq8]]; completes the lazy fleet across the
  * cell-partitioned codec families. */
final class ServeRouterSq8Lazy private (
    val model: graft.index.IvfSq8Model,
    shards: IndexedSeq[Sq8Shard],
    assign: Int => Int) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm-or-cold top-k across the lazy SQ8 fleet — bit-identical to
    * one [[LocalServeSq8Lazy]] holding every cell. */
  def query(q: Array[Double], k: Int, nprobe: Int)
      : Array[(Long, Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes = graft.index.IvfSq8.selectPartitions(model, q, nprobe)
    ShardFan.mergeTopK(
      ShardFan.fanOut(probes, assign, shards.length,
        (si, sp) => shards(si).queryProbes(sp, k)),
      k)
  }

  /** Fleet warm-up — see [[ServeRouterLazy.prefetch]]. */
  def prefetch(cells: Seq[Int]): Unit =
    ShardFan.fanPrefetch(cells, assign, shards.length,
      (si, cs) => shards(si).prefetchCells(cs))
}

object ServeRouterSq8Lazy {

  /** Assemble a lazy SQ8 fleet — same contract as
    * [[ServeRouterLazy.apply]]. */
  def apply(model: graft.index.IvfSq8Model, shards: Seq[Sq8Shard],
            assign: Int => Int): ServeRouterSq8Lazy = {
    require(shards.nonEmpty, "router needs at least one shard")
    new ServeRouterSq8Lazy(model, shards.toIndexedSeq, assign)
  }
}

/** [[ServeRouterLazy]] for two-level RQ lazy shards — static
  * assignment, lazy per-cell pinning of BOTH code layers, and the
  * [[ServeRouterRq]] two-phase merge (global level-1 nomination cut,
  * then the refined order); completes the lazy fleet's refine path. */
final class ServeRouterRqLazy private (
    val model: graft.index.Rq.RqModel,
    shards: IndexedSeq[RqShard],
    assign: Int => Int) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm-or-cold refined top-k across the lazy RQ fleet —
    * bit-identical to one [[LocalServeRqLazy]] holding every cell. */
  def query(q: Array[Double], k: Int, nprobe: Int,
            kFactor: Int = 4): Array[(Long, Double)] = {
    require(k >= 1 && kFactor >= 1, s"bad k=$k / kFactor=$kFactor")
    val probes = AnnQuery.selectPartitions(model.base, q, nprobe)
    val n = k * kFactor
    val nominees = ShardFan.fanOut(probes, assign, shards.length,
      (si, sp) => shards(si).nomineesScored(sp, q, n))
    ShardFan.mergeTwoPhase(nominees.map(t => (t._1, t._3, t._4)), n, k)
  }

  /** Fleet warm-up — see [[ServeRouterLazy.prefetch]]. */
  def prefetch(cells: Seq[Int]): Unit =
    ShardFan.fanPrefetch(cells, assign, shards.length,
      (si, cs) => shards(si).prefetchCells(cs))
}

object ServeRouterRqLazy {

  /** Assemble a lazy RQ fleet — same contract as
    * [[ServeRouterLazy.apply]]. */
  def apply(model: graft.index.Rq.RqModel, shards: Seq[RqShard],
            assign: Int => Int): ServeRouterRqLazy = {
    require(shards.nonEmpty, "router needs at least one shard")
    new ServeRouterRqLazy(model, shards.toIndexedSeq, assign)
  }
}
