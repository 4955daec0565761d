package graft.query

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The lazy-residency concurrency contract (the round-12 defect class):
  * warm queries never block behind a cold load, concurrent cold queries
  * for the same cell share ONE load, distinct cells load in parallel,
  * eviction honors caps and use-pins, empty cells pin as empty, and
  * loader failures propagate without wedging the cell. The delegate
  * here is the resident map itself — the serving families layer their
  * arithmetic on top and are parity-tested in LocalServeSpec. */
class LazyResidencySpec extends AnyFunSuite {

  private type P = Array[Long]

  /** A residency whose loader blocks on per-cell latches and counts
    * invocations — the instrument for every concurrency assertion. */
  private final class Harness(maxCells: Int = 0, maxBytes: Long = 0L,
                              payloadFor: Int => Array[Long] =
                                c => Array.fill(4)(c.toLong)) {
    val loadCalls = new AtomicInteger(0)
    val cellsLoaded = new ConcurrentHashMap[Int, AtomicInteger]
    val gates = new ConcurrentHashMap[Int, CountDownLatch]
    val inLoad = new AtomicInteger(0)
    var maxConcurrentLoads = 0 // monotone under races: updated via sync
    private val mcLock = new Object
    @volatile var absentCells: Set[Int] = Set.empty

    def gate(c: Int): CountDownLatch =
      gates.computeIfAbsent(c, _ => new CountDownLatch(1))

    val res = new LazyResidency[P, Map[Int, P]](
      loadCells = { missing =>
        loadCalls.incrementAndGet()
        val cur = inLoad.incrementAndGet()
        mcLock.synchronized {
          maxConcurrentLoads = math.max(maxConcurrentLoads, cur)
        }
        try {
          missing.foreach { c =>
            cellsLoaded.computeIfAbsent(c, _ => new AtomicInteger)
              .incrementAndGet()
            val g = gates.get(c)
            if (g != null) assert(g.await(20, TimeUnit.SECONDS),
              s"gate for cell $c never opened")
          }
          missing.filterNot(absentCells).map(c => c -> payloadFor(c)).toMap
        } finally inLoad.decrementAndGet()
      },
      emptyPayload = Array.empty[Long],
      payloadBytes = p => 8L * p.length,
      mkDelegate = identity,
      maxResidentCells = maxCells,
      maxResidentBytes = maxBytes)
  }

  private def inThread(body: => Unit): Thread = {
    val t = new Thread(() => body)
    t.setDaemon(true)
    t.start()
    t
  }

  test("warm queries complete while a cold load is in flight " +
      "(no head-of-line blocking)") {
    val h = new Harness()
    h.res.withResident(Array(1))(m => assert(m(1).nonEmpty)) // warm up 1
    val coldGate = h.gate(2)
    val coldDone = new CountDownLatch(1)
    inThread {
      // instrument: the loader counts cell 2 before blocking on its gate
      h.res.withResident(Array(2)) { m =>
        assert(m.contains(2)); coldDone.countDown()
      }
    }
    // wait until the cold load is genuinely in flight
    val t0 = System.nanoTime()
    while (h.cellsLoaded.get(2) == null && System.nanoTime() - t0 < 10e9) {
      Thread.sleep(1)
    }
    assert(h.cellsLoaded.get(2) != null, "cold load never started")
    // WARM query on cell 1 must answer NOW, with the cold load parked
    val warmT0 = System.nanoTime()
    h.res.withResident(Array(1))(m => assert(m(1).nonEmpty))
    val warmMs = (System.nanoTime() - warmT0) / 1e6
    assert(h.inLoad.get() == 1, "cold load should still be in flight")
    assert(warmMs < 2000, s"warm query took ${warmMs} ms behind a cold load")
    coldGate.countDown()
    assert(coldDone.await(20, TimeUnit.SECONDS))
    assert(h.res.cells === Seq(1, 2))
  }

  test("concurrent cold queries for the SAME cell share one load; " +
      "distinct cells load in parallel") {
    val h = new Harness()
    val g5 = h.gate(5)
    val g6 = h.gate(6)
    val done = new CountDownLatch(3)
    inThread { h.res.withResident(Array(5))(m => { assert(m.contains(5)); done.countDown() }) }
    inThread { h.res.withResident(Array(5))(m => { assert(m.contains(5)); done.countDown() }) }
    inThread { h.res.withResident(Array(6))(m => { assert(m.contains(6)); done.countDown() }) }
    val t0 = System.nanoTime()
    while ((h.cellsLoaded.get(5) == null || h.cellsLoaded.get(6) == null) &&
        System.nanoTime() - t0 < 10e9) Thread.sleep(1)
    // both cells in flight AT THE SAME TIME (two parked loader calls)
    assert(h.inLoad.get() == 2, "distinct cells should load in parallel")
    g5.countDown(); g6.countDown()
    assert(done.await(20, TimeUnit.SECONDS))
    // cell 5 was requested by two queries but loaded exactly once
    assert(h.cellsLoaded.get(5).get() === 1,
      "same-cell concurrent queries must share one load")
    assert(h.cellsLoaded.get(6).get() === 1)
    assert(h.res.coldLoads === 2L) // cell 5 once, cell 6 once
  }

  test("cold-load accounting: one load per cell ever, warm repeats free") {
    val h = new Harness()
    h.res.withResident(Array(1, 2))(m => assert(m.size == 2))
    assert(h.res.coldLoads === 2L)
    h.res.withResident(Array(1, 2))(_ => ())
    h.res.withResident(Array(2))(_ => ())
    assert(h.res.coldLoads === 2L)
    assert(h.loadCalls.get() === 1, "one batched scan for the cold pair")
  }

  test("cell cap evicts least-recently-probed; in-use cells survive") {
    val h = new Harness(maxCells = 2)
    h.res.withResident(Array(1))(_ => ())
    h.res.withResident(Array(2))(_ => ())
    h.res.withResident(Array(3))(_ => ()) // evicts 1
    assert(h.res.cells === Seq(2, 3))
    h.res.withResident(Array(2))(_ => ()) // touch 2 → 3 is now LRU
    h.res.withResident(Array(4))(_ => ()) // evicts 3
    assert(h.res.cells === Seq(2, 4))
    // a re-probe of an evicted cell cold-loads again
    val before = h.res.coldLoads
    h.res.withResident(Array(1))(_ => ())
    assert(h.res.coldLoads === before + 1)
    // while a query holds its cells in-use, they cannot be evicted:
    // run a nested acquisition from inside the critical section
    h.res.withResident(Array(1, 2)) { _ =>
      inThread { h.res.withResident(Array(7))(_ => ()) }.join(20000)
      assert(h.res.cells.contains(1) && h.res.cells.contains(2),
        "in-use cells must survive a concurrent over-cap install")
    }
  }

  test("bytes cap: eviction keeps resident bytes within the cap " +
      "(single in-flight query), and a single over-cap working set " +
      "still answers") {
    // payload = 4 longs = 32 bytes per cell
    val h = new Harness(maxBytes = 64L)
    h.res.withResident(Array(1))(_ => ())
    h.res.withResident(Array(2))(_ => ())
    assert(h.res.residentBytes === 64L)
    h.res.withResident(Array(3))(_ => ())
    assert(h.res.residentBytes === 64L, "bytes cap must evict down to 64")
    assert(h.res.cells === Seq(2, 3))
    // one query probing 3 cells (96 B > cap) still answers; the overage
    // is its own pinned working set
    h.res.withResident(Array(4, 5, 6))(m =>
      assert(m.contains(4) && m.contains(5) && m.contains(6)))
    // next single-cell install drains the overage back under the cap
    h.res.withResident(Array(7))(_ => ())
    assert(h.res.residentBytes <= 64L)
  }

  test("empty cells pin as empty residents instead of erroring, and " +
      "count as resident (no reload per probe)") {
    val h = new Harness()
    h.absentCells = Set(9)
    h.res.withResident(Array(8, 9)) { m =>
      assert(m(8).nonEmpty)
      assert(m.contains(9) && m(9).isEmpty,
        "a store-absent cell pins as an EMPTY resident")
    }
    val loads = h.res.coldLoads
    h.res.withResident(Array(9))(m => assert(m(9).isEmpty))
    assert(h.res.coldLoads === loads, "empty residents are warm")
  }

  test("loader failure propagates, does not wedge the cell, and a " +
      "retry succeeds") {
    var fail = true
    val res = new LazyResidency[P, Map[Int, P]](
      loadCells = { missing =>
        if (fail) throw new RuntimeException("scan failed")
        missing.map(c => c -> Array(c.toLong)).toMap
      },
      emptyPayload = Array.empty[Long],
      payloadBytes = p => 8L * p.length,
      mkDelegate = identity,
      maxResidentCells = 0, maxResidentBytes = 0L)
    val ex = intercept[RuntimeException] {
      res.withResident(Array(1))(_ => ())
    }
    assert(ex.getMessage === "scan failed")
    fail = false
    res.withResident(Array(1))(m => assert(m(1).sameElements(Array(1L))))
  }

  test("install-path throw (payloadBytes/mkDelegate) fails parked " +
      "waiters instead of hanging them, and a retry succeeds") {
    // the r13 review nit: loadCells failures were handled but a throw
    // INSIDE the install block (user-supplied payloadBytes/mkDelegate)
    // left claimed promises incomplete — waiters parked on
    // Await.result(..., Inf) would hang forever
    @volatile var failInstall = true
    val loaderEntered = new CountDownLatch(1)
    val loaderGate = new CountDownLatch(1)
    val res = new LazyResidency[P, Map[Int, P]](
      loadCells = { missing =>
        loaderEntered.countDown()
        assert(loaderGate.await(20, TimeUnit.SECONDS))
        missing.map(c => c -> Array(c.toLong)).toMap
      },
      emptyPayload = Array.empty[Long],
      payloadBytes = p => {
        if (failInstall) throw new RuntimeException("install blew up")
        8L * p.length
      },
      mkDelegate = identity,
      maxResidentCells = 0, maxResidentBytes = 0L)
    // claimant thread: wins the inflight claim, parks in the loader
    val claimantErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val claimantDone = new CountDownLatch(1)
    inThread {
      try res.withResident(Array(1))(_ => ())
      catch { case t: Throwable => claimantErr.set(t) }
      finally claimantDone.countDown()
    }
    assert(loaderEntered.await(20, TimeUnit.SECONDS))
    // waiter thread: joins the claimant's in-flight promise
    val waiterErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val waiterDone = new CountDownLatch(1)
    inThread {
      try res.withResident(Array(1))(_ => ())
      catch { case t: Throwable => waiterErr.set(t) }
      finally waiterDone.countDown()
    }
    Thread.sleep(50) // let the waiter park on the shared promise
    loaderGate.countDown() // loader returns; install then THROWS
    assert(claimantDone.await(20, TimeUnit.SECONDS), "claimant hung")
    assert(waiterDone.await(20, TimeUnit.SECONDS),
      "waiter hung on a promise the throwing install never completed")
    assert(claimantErr.get() != null &&
      claimantErr.get().getMessage == "install blew up")
    assert(waiterErr.get() != null, "waiter must observe the failure")
    // the cell is not wedged: a retry with a healthy install succeeds
    failInstall = false
    res.withResident(Array(1))(m => assert(m(1).sameElements(Array(1L))))
    assert(res.residentBytes === 8L)
  }

  test("prefetch pins cells ahead of traffic in one batched load; " +
      "queries on a prefetched set are warm (no further loads)") {
    val h = new Harness()
    h.res.prefetch(Seq(1, 2, 3))
    assert(h.res.cells === Seq(1, 2, 3))
    assert(h.res.coldLoads === 3L)
    assert(h.loadCalls.get() === 1, "one batched scan for the hot set")
    h.res.withResident(Array(1, 2))(m => assert(m.size >= 2))
    h.res.withResident(Array(3))(_ => ())
    assert(h.res.coldLoads === 3L, "prefetched cells must answer warm")
    assert(h.loadCalls.get() === 1)
  }

  test("prefetch shares in-flight loads with queries: a concurrently " +
      "queried cell loads exactly once") {
    val h = new Harness()
    val g5 = h.gate(5)
    val queryDone = new CountDownLatch(1)
    inThread { // query claims cell 5 and parks in the loader
      h.res.withResident(Array(5))(m => {
        assert(m.contains(5)); queryDone.countDown()
      })
    }
    val t0 = System.nanoTime()
    while (h.cellsLoaded.get(5) == null && System.nanoTime() - t0 < 10e9) {
      Thread.sleep(1)
    }
    // prefetch overlapping the in-flight cell: claims only 6, then
    // parks on 5's shared promise instead of re-loading it
    val prefetchDone = new CountDownLatch(1)
    inThread { h.res.prefetch(Seq(5, 6)); prefetchDone.countDown() }
    val t1 = System.nanoTime()
    while (h.cellsLoaded.get(6) == null && System.nanoTime() - t1 < 10e9) {
      Thread.sleep(1)
    }
    g5.countDown()
    assert(queryDone.await(20, TimeUnit.SECONDS))
    assert(prefetchDone.await(20, TimeUnit.SECONDS))
    assert(h.cellsLoaded.get(5).get() === 1,
      "prefetch must join the query's in-flight load, not duplicate it")
    assert(h.cellsLoaded.get(6).get() === 1)
    assert(h.res.cells === Seq(5, 6))
  }

  test("warm queries are unblocked while a prefetch loads in the " +
      "background") {
    val h = new Harness()
    h.res.withResident(Array(1))(_ => ()) // warm up 1
    val g9 = h.gate(9)
    val prefetchDone = new CountDownLatch(1)
    inThread { h.res.prefetch(Seq(9)); prefetchDone.countDown() }
    val t0 = System.nanoTime()
    while (h.cellsLoaded.get(9) == null && System.nanoTime() - t0 < 10e9) {
      Thread.sleep(1)
    }
    val warmT0 = System.nanoTime()
    h.res.withResident(Array(1))(m => assert(m(1).nonEmpty))
    val warmMs = (System.nanoTime() - warmT0) / 1e6
    assert(h.inLoad.get() == 1, "prefetch load should still be in flight")
    assert(warmMs < 2000, s"warm query took ${warmMs} ms behind a prefetch")
    g9.countDown()
    assert(prefetchDone.await(20, TimeUnit.SECONDS))
    assert(h.res.cells === Seq(1, 9))
  }

  test("prefetch is best-effort under caps: residency never exceeds the " +
      "cap and the state is not wedged") {
    val h = new Harness(maxCells = 2)
    h.res.prefetch(Seq(1, 2, 3))
    assert(h.res.cells.size <= 2,
      s"prefetch wedged residency above the cap: ${h.res.cells}")
    // follow-up queries behave normally (evict/load as usual)
    h.res.withResident(Array(1, 2))(m => assert(m.size >= 2))
    assert(h.res.cells.size <= 2)
  }

  test("probe-count precondition against the cell cap stays loud") {
    val h = new Harness(maxCells = 2)
    val ex = intercept[IllegalArgumentException] {
      h.res.withResident(Array(1, 2, 3))(_ => ())
    }
    assert(ex.getMessage.contains("maxResidentCells"))
  }

  test("randomized stress: 8 threads x 400 acquisitions over 32 cells " +
      "under a tight cap — every delegate covers its probes with the " +
      "correct payloads, loads stay deduplicated per residency epoch") {
    val h = new Harness(maxCells = 6)
    val nCells = 32
    val threads = 8
    val opsPerThread = 400
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val done = new CountDownLatch(threads)
    (0 until threads).foreach { ti =>
      inThread {
        val rnd = new scala.util.Random(7919L * (ti + 1))
        var op = 0
        try {
          while (op < opsPerThread) {
            val n = 1 + rnd.nextInt(3)
            val probed = Array.fill(n)(rnd.nextInt(nCells)).distinct
            h.res.withResident(probed) { m =>
              probed.foreach { c =>
                val p = m.get(c)
                if (p.isEmpty)
                  errors.add(s"t$ti op$op: cell $c missing from delegate")
                else if (!p.get.sameElements(Array.fill(4)(c.toLong)))
                  errors.add(s"t$ti op$op: cell $c wrong payload")
              }
            }
            op += 1
          }
        } finally done.countDown()
      }
    }
    assert(done.await(120, TimeUnit.SECONDS), "stress run timed out")
    assert(errors.isEmpty, s"stress errors: ${errors.toArray.take(5).mkString("; ")}")
    // liveness bookkeeping: no in-flight entries or use-pins left behind
    assert(h.res.coldLoads >= 32L, "every cell must have loaded at least once")
    // single-threaded follow-up still behaves (no wedged state), and an
    // install with no concurrent pins drains any pin-era overage: force
    // a cold install by probing a currently-absent cell
    val absent = (0 until nCells).find(c => !h.res.cells.contains(c))
      .getOrElse { // all resident (cap must have been ineffective) — evict path
        fail(s"expected an absent cell under cap 6, resident=${h.res.cells}")
      }
    h.res.withResident(Array(absent))(m => assert(m.contains(absent)))
    assert(h.res.cells.size <= 6,
      s"post-install residency ${h.res.cells.size} exceeds the cap")
  }

  test("bytes accounting stays exact under eviction-heavy races " +
      "(stale-claim reinstall must not double-count payload bytes)") {
    // tight BYTE cap + few cells + many threads = constant evict/reload
    // churn, the interleaving where a thread holding a stale snapshot
    // wins the inflight claim for an already-resident cell; the r13
    // defect double-counted that cell's bytes on reinstall, so
    // residentBytes drifted up and the byte cap over-evicted forever
    val h = new Harness(maxBytes = 96L) // 3 cells of 32 B
    val nCells = 8
    val threads = 8
    val opsPerThread = 600
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val done = new CountDownLatch(threads)
    (0 until threads).foreach { ti =>
      inThread {
        val rnd = new scala.util.Random(104729L * (ti + 1))
        var op = 0
        try {
          while (op < opsPerThread) {
            val c = rnd.nextInt(nCells)
            h.res.withResident(Array(c)) { m =>
              if (!m.contains(c)) errors.add(s"t$ti op$op: $c missing")
            }
            op += 1
          }
        } finally done.countDown()
      }
    }
    assert(done.await(120, TimeUnit.SECONDS), "stress run timed out")
    assert(errors.isEmpty, s"stress errors: ${errors.toArray.take(5).mkString("; ")}")
    // the invariant the double-count breaks: accounted bytes must equal
    // the actual payload bytes of the resident set, exactly
    val s = h.res.cells
    assert(h.res.residentBytes === 32L * s.size,
      s"residentBytes ${h.res.residentBytes} != 32*${s.size} — " +
        "byte accounting drifted (double-counted reinstall?)")
    // and one quiescent install drains any pin-era overage under the cap
    h.res.withResident(Array((0 until 32).find(c => !s.contains(c)).get))(_ => ())
    assert(h.res.residentBytes <= 96L)
    assert(h.res.residentBytes === 32L * h.res.cells.size)
  }
}
