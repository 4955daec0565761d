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
    val missing = probes.map(_._1).filterNot(cellShard.contains)
    require(missing.isEmpty,
      s"probed cells not resident on any shard: ${missing.mkString(",")}")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val byShard = probes.groupBy { case (cell, _) => cellShard(cell) }
    val futs = byShard.toSeq.map { case (si, shardProbes) =>
      Future(shards(si).queryProbes(shardProbes, k, pred))
    }
    Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
      .sortBy(t => (t._3, t._1)).take(k)
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
      Future(shards(si).queryProbes(shardProbes, k, pred))
    }
    Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
      .sortBy(t => (t._3, t._1)).take(k)
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

/** [[ServeRouter]] for IVF+SQ8 shards — identical routing and merge
  * over [[LocalServeSq8.queryProbes]]; the per-row sq8 distance is a
  * pure function of (codec constants, localized query, row), so the
  * merge argument carries over unchanged. */
final class ServeRouterSq8 private (
    val model: graft.index.IvfSq8Model,
    shards: IndexedSeq[LocalServeSq8],
    cellShard: Map[Int, Int]) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm top-k across the fleet — bit-identical to a single
    * [[LocalServeSq8]] holding every shard's cells. */
  def query(q: Array[Double], k: Int, nprobe: Int)
      : Array[(Long, Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes = graft.index.IvfSq8.selectPartitions(model, q, nprobe)
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
    Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
      .sortBy(t => (t._3, t._1)).take(k)
  }
}

object ServeRouterSq8 {

  /** Assemble over cell-disjoint SQ8 shards — same contract as
    * [[ServeRouter.apply]]. */
  def apply(model: graft.index.IvfSq8Model,
            shards: Seq[LocalServeSq8]): ServeRouterSq8 = {
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
  * nominees WITH BOTH scores ([[LocalServeRq.nomineesScored]]), the
  * router re-applies the global level-1 order to reconstruct the single
  * box's nomination set exactly, and only then applies the refined
  * (sq_dist, id) order. Both scores are pure functions of
  * (model, q, row), so shard-local computation cannot change them. */
final class ServeRouterRq private (
    val model: graft.index.Rq.RqModel,
    shards: IndexedSeq[LocalServeRq],
    cellShard: Map[Int, Int]) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm refined top-k across the fleet — bit-identical to a single
    * [[LocalServeRq]] holding every shard's cells. */
  def query(q: Array[Double], k: Int, nprobe: Int,
            kFactor: Int = 4): Array[(Long, Double)] = {
    require(k >= 1 && kFactor >= 1, s"bad k=$k / kFactor=$kFactor")
    val probes = AnnQuery.selectPartitions(model.base, q, nprobe)
    val missing = probes.map(_._1).filterNot(cellShard.contains)
    require(missing.isEmpty,
      s"probed cells not resident on any shard: ${missing.mkString(",")}")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val n = k * kFactor
    val byShard = probes.groupBy { case (cell, _) => cellShard(cell) }
    val futs = byShard.toSeq.map { case (si, shardProbes) =>
      Future(shards(si).nomineesScored(shardProbes, q, n))
    }
    val nominees = Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
    // phase 1: the single box's nomination cut — global top-n by the
    // LEVEL-1 order; phase 2: the refined order over exactly that set
    nominees.sortBy(t => (t._3, t._1)).take(n)
      .map(t => (t._1, t._4))
      .sortBy(t => (t._2, t._1)).take(k)
  }
}

object ServeRouterRq {

  /** Assemble over cell-disjoint RQ shards — same contract as
    * [[ServeRouter.apply]]. */
  def apply(model: graft.index.Rq.RqModel,
            shards: Seq[LocalServeRq]): ServeRouterRq = {
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
  * ([[LocalServeHamming.rerankCandidates]]), the router re-applies the
  * global Hamming nomination cut, then the exact (sq_dist, id) order —
  * bit-identical to the single box's nominate-then-rerank. */
final class ServeRouterHamming private (
    shards: IndexedSeq[LocalServeHamming]) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm Hamming top-k across the fleet — bit-identical to a single
    * [[LocalServeHamming]] holding every shard's rows. */
  def query(q: Array[Float], k: Int): Array[(Long, Long)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futs = shards.map(s => Future(s.query(q, k)))
    Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
      .sortBy(t => (t._2, t._1)).take(k)
  }

  /** Hamming-nominate + exact re-rank across the fleet — bit-identical
    * to the single box's [[LocalServeHamming.queryRerank]] (two-phase
    * merge; every shard must have floats pinned). */
  def queryRerank(q: Array[Float], k: Int,
                  kFactor: Int = 4): Array[(Long, Double)] = {
    require(k >= 1 && kFactor >= 1, s"bad k=$k / kFactor=$kFactor")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val n = k * kFactor
    val futs = shards.map(s => Future(s.rerankCandidates(q, n)))
    val nominees = Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
    nominees.sortBy(t => (t._2, t._1)).take(n)
      .map(t => (t._1, t._3))
      .sortBy(t => (t._2, t._1)).take(k)
  }
}

object ServeRouterHamming {

  /** Assemble over ID-disjoint signature shards (overlap would
    * double-count candidates — checked at assembly; shard sizes are
    * driver-resident by the serving contract, so the check is cheap). */
  def apply(shards: Seq[LocalServeHamming]): ServeRouterHamming = {
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
    shards: IndexedSeq[LocalServeSq8Lazy],
    assign: Int => Int) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm-or-cold top-k across the lazy SQ8 fleet — bit-identical to
    * one [[LocalServeSq8Lazy]] holding every cell. */
  def query(q: Array[Double], k: Int, nprobe: Int)
      : Array[(Long, Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probes = graft.index.IvfSq8.selectPartitions(model, q, nprobe)
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
    Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
      .sortBy(t => (t._3, t._1)).take(k)
  }
}

object ServeRouterSq8Lazy {

  /** Assemble a lazy SQ8 fleet — same contract as
    * [[ServeRouterLazy.apply]]. */
  def apply(model: graft.index.IvfSq8Model, shards: Seq[LocalServeSq8Lazy],
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
    shards: IndexedSeq[LocalServeRqLazy],
    assign: Int => Int) {

  /** Number of shards behind this router. */
  def numShards: Int = shards.length

  /** Warm-or-cold refined top-k across the lazy RQ fleet —
    * bit-identical to one [[LocalServeRqLazy]] holding every cell. */
  def query(q: Array[Double], k: Int, nprobe: Int,
            kFactor: Int = 4): Array[(Long, Double)] = {
    require(k >= 1 && kFactor >= 1, s"bad k=$k / kFactor=$kFactor")
    val probes = AnnQuery.selectPartitions(model.base, q, nprobe)
    val bad = probes.map(_._1).filter { c =>
      val s = assign(c); s < 0 || s >= shards.length
    }
    require(bad.isEmpty,
      s"probed cells assigned to no shard: ${bad.mkString(",")}")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val n = k * kFactor
    val byShard = probes.groupBy { case (cell, _) => assign(cell) }
    val futs = byShard.toSeq.map { case (si, shardProbes) =>
      Future(shards(si).nomineesScored(shardProbes, q, n))
    }
    val nominees = Await.result(Future.sequence(futs), Duration.Inf)
      .toArray.flatten
    nominees.sortBy(t => (t._3, t._1)).take(n)
      .map(t => (t._1, t._4))
      .sortBy(t => (t._2, t._1)).take(k)
  }
}

object ServeRouterRqLazy {

  /** Assemble a lazy RQ fleet — same contract as
    * [[ServeRouterLazy.apply]]. */
  def apply(model: graft.index.Rq.RqModel, shards: Seq[LocalServeRqLazy],
            assign: Int => Int): ServeRouterRqLazy = {
    require(shards.nonEmpty, "router needs at least one shard")
    new ServeRouterRqLazy(model, shards.toIndexedSeq, assign)
  }
}
