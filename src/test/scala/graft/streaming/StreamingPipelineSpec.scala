package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end streaming ingest parity: the composed foreachBatch chain
  * (quality → exact dedup vs persisted hashes → decontaminate vs the
  * static gram state → leak-safe split vs the static rep map) must
  * accumulate EXACTLY the one-shot batch result when batches arrive in
  * ascending id ranges, trigger by trigger. */
class StreamingPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a corpus exercising every stage:
  //  - 1/2: near-dups of each other (a pair -> shared rep/split)
  //  - 3: exact dup of 1 (same text) -> dropped by dedup
  //  - 4: too short -> dropped by quality
  //  - 5: contains the benchmark 8-gram -> dropped by decontamination
  //  - 6: clean singleton
  //  - 7 (LATER batch): exact dup of 6 -> dropped against the STATE
  private val long = (w: String) =>
    (1 to 25).map(i => s"$w$i").mkString(" ")
  private val benchText =
    "secret eval question one two three four five six seven eight nine"
  private val rows = Seq(
    (1L, long("alpha")),
    (2L, long("alpha") + " tail"),
    (3L, long("alpha")),
    (4L, "too short"),
    (5L, long("clean") + " " + benchText),
    (6L, long("zulu")),
    (7L, long("zulu")))
  private lazy val docs = rows.toDF("doc_id", "text")
  private lazy val bench = Seq((100L, benchText)).toDF("doc_id", "text")
  private lazy val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")

  test("accumulated stream output == oneShot; triggers emit disjoint " +
      "increments; state catches cross-batch dups") {
    val grams = StreamingPipeline.benchGramState(bench, "text", 8)
      .localCheckpoint()
    val reps = StreamingPipeline.repState(pairs).localCheckpoint()
    val expected = StreamingPipeline.oneShot(docs, bench, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet

    val input = MemoryStream[(Long, String)](spark)
    var state = StreamingPipeline.emptyHashState(spark)
    var acc = List.empty[Array[(Long, Long, String)]]
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (out, newState) =
          StreamingPipeline.processBatch(batch, state, grams, reps)
        state = newState.localCheckpoint()
        acc = acc :+ out.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        ()
      }
      .start()
    try {
      // ascending id ranges — the keeper-parity contract
      input.addData(rows.filter(_._1 <= 3L))
      query.processAllAvailable()
      input.addData(rows.filter(r => r._1 > 3L && r._1 <= 6L))
      query.processAllAvailable()
      input.addData(rows.filter(_._1 > 6L))
      query.processAllAvailable()
    } finally query.stop()

    assert(acc.length === 3)
    // per-trigger increments are disjoint and correct
    val t1 = acc(0).map(_._1).toSet
    val t2 = acc(1).map(_._1).toSet
    val t3 = acc(2).map(_._1).toSet
    assert(t1 === Set(1L, 2L)) // 3 deduped in-batch, 4/5/6 not arrived
    assert(t2 === Set(6L))     // 4 quality-dropped, 5 contaminated
    assert(t3 === Set.empty)   // 7 is an exact dup of 6 — caught by STATE
    assert((t1 ++ t2 ++ t3).size === acc.flatten.length)
    // accumulated == one-shot, including reps and splits
    assert(acc.flatten.toSet === expected)
    // the near-dup pair shares its rep (and therefore its split)
    val byId = acc.flatten.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 === byId(2L)._2)
    assert(byId(1L)._3 === byId(2L)._3)
    // singleton rep defaults to its own id
    assert(byId(6L)._2 === 6L)
  }

  test("oneShot equals the stream under a DIFFERENT ascending batching " +
      "(batch-boundary independence)") {
    val grams = StreamingPipeline.benchGramState(bench, "text", 8)
      .localCheckpoint()
    val reps = StreamingPipeline.repState(pairs).localCheckpoint()
    val expected = StreamingPipeline.oneShot(docs, bench, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    var state = StreamingPipeline.emptyHashState(spark)
    val out = Seq(Seq(1L), Seq(2L, 3L, 4L, 5L), Seq(6L, 7L)).flatMap { b =>
      val batch = rows.filter(r => b.contains(r._1)).toDF("doc_id", "text")
      val (o, ns) = StreamingPipeline.processBatch(batch, state, grams, reps)
      state = ns.localCheckpoint()
      o.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    }
    assert(out.toSet === expected)
  }

  test("keeperViolations: an out-of-order MemoryStream ingest is " +
      "DETECTED (smaller id arriving after its hash was emitted), " +
      "compliant ascending ingest audits empty") {
    val grams = StreamingPipeline.benchGramState(bench, "text", 8)
      .localCheckpoint()
    val reps = StreamingPipeline.repState(pairs).localCheckpoint()
    // id 0 carries doc 6's exact text but arrives AFTER 6 was emitted —
    // the one-shot batch keeper would have crowned 0, so this is
    // precisely the contract violation the audit exists to catch
    val late = Seq((0L, rows.find(_._1 == 6L).get._2))
    val input = MemoryStream[(Long, String)](spark)
    var state = StreamingPipeline.emptyHashState(spark)
    var audits = List.empty[Array[(String, Long, Long)]]
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        audits = audits :+ StreamingPipeline
          .keeperViolations(batch, state)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val (_, newState) =
          StreamingPipeline.processBatch(batch, state, grams, reps)
        state = newState.localCheckpoint()
        ()
      }
      .start()
    try {
      input.addData(rows) // trigger 1: the whole ascending corpus
      query.processAllAvailable()
      input.addData(late) // trigger 2: id 0 AFTER its hash was emitted
      query.processAllAvailable()
    } finally query.stop()
    assert(audits.length === 2)
    assert(audits(0).isEmpty) // ascending ingest: no violations
    val viol = audits(1)
    assert(viol.length === 1)
    assert(viol(0)._2 === 6L && viol(0)._3 === 0L) // keeper 6, intruder 0
    // a low-quality late arrival is NOT a violation (the one-shot would
    // have quality-dropped it before dedup)
    val junk = Seq((0L, "too short")).toDF("doc_id", "text")
    assert(StreamingPipeline.keeperViolations(junk, state).isEmpty)
  }

  test("reorderBatch: a shuffled MemoryStream ingest that WOULD trip " +
      "the keeper audit runs clean through the bounded-delay buffer, " +
      "and the accumulated output equals oneShot") {
    val grams = StreamingPipeline.benchGramState(bench, "text", 8)
      .localCheckpoint()
    val reps = StreamingPipeline.repState(pairs).localCheckpoint()
    val expected = StreamingPipeline.oneShot(docs, bench, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    // arrival order displaces id 1 (text-dup of 3) AFTER 3: batches
    // (3,2) / (1,4,5) / (6,7) — every displacement ≤ 2 positions
    val arrival = Seq(Seq(3L, 2L), Seq(1L, 4L, 5L), Seq(6L, 7L))
    def batchFor(ids: Seq[Long]) =
      rows.filter(r => ids.contains(r._1)).toDF("doc_id", "text")

    // WITHOUT the buffer this ingest trips the audit (3 emitted, then 1)
    var state0 = StreamingPipeline.emptyHashState(spark)
    val rawViolations = arrival.map { ids =>
      val b = batchFor(ids)
      val v = StreamingPipeline.keeperViolations(b, state0).count()
      val (_, ns) = StreamingPipeline.processBatch(b, state0, grams, reps)
      state0 = ns.localCheckpoint()
      v
    }.sum
    assert(rawViolations > 0L, "fixture must violate the raw contract")

    // WITH the buffer (w = 2): audits empty per trigger, output == oneShot
    val input = MemoryStream[(Long, String)](spark)
    var state = StreamingPipeline.emptyHashState(spark)
    var held = StreamingPipeline.emptyHeldState(docs)
    var audits = List.empty[Long]
    var acc = List.empty[Array[(Long, Long, String)]]
    def runReordered(batch: org.apache.spark.sql.DataFrame): Unit = {
      val (released, newHeld) =
        StreamingPipeline.reorderBatch(batch, held, w = 2)
      held = newHeld.localCheckpoint()
      val rel = released.localCheckpoint()
      audits = audits :+
        StreamingPipeline.keeperViolations(rel, state).count()
      val (out, ns) = StreamingPipeline.processBatch(rel, state, grams, reps)
      state = ns.localCheckpoint()
      acc = acc :+ out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    }
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        runReordered(batch); ()
      }
      .start()
    try {
      arrival.foreach { ids =>
        input.addData(rows.filter(r => ids.contains(r._1)))
        query.processAllAvailable()
      }
    } finally query.stop()
    // stream end: FLUSH — the held window (the w largest ids, all
    // larger than anything released) processes directly as the final
    // released batch
    audits = audits :+
      StreamingPipeline.keeperViolations(held, state).count()
    val (lastOut, _) = StreamingPipeline.processBatch(held, state, grams, reps)
    acc = acc :+ lastOut.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(audits.forall(_ === 0L),
      s"buffered ingest must audit clean, got $audits")
    assert(acc.flatten.toSet === expected)
  }

  test("reorderBatch: the round-14 threshold split equals the ranked " +
      "form on randomized pools (incl. pool <= w, empty pool, w = 0)") {
    // the form it replaced: a single-partition row_number window —
    // output-identical, but the pipeline's only single-task stage
    def rankedForm(batch: org.apache.spark.sql.DataFrame,
                   held: org.apache.spark.sql.DataFrame, w: Int) = {
      val pool = held.unionByName(batch)
      val ranked = pool.withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("doc_id").desc)))
      (ranked.where(col("__rn") > w).drop("__rn"),
        ranked.where(col("__rn") <= w).drop("__rn"))
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4; w <- Seq(0, 1, 3, 8, 50)) {
      val n = if (trial == 0) 0 else rnd.nextInt(40)
      val ids = rnd.shuffle((0 until 200).toList).take(n).map(_.toLong)
      val batch = ids.map(i => (i, s"text $i")).toDF("doc_id", "text")
      val held = StreamingPipeline.emptyHeldState(batch)
      val (r1, h1) = StreamingPipeline.reorderBatch(batch, held, w)
      val (r2, h2) = rankedForm(batch, held, w)
      def idsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.getLong(0)).toSet
      assert(idsOf(r1) === idsOf(r2), s"trial=$trial w=$w released differ")
      assert(idsOf(h1) === idsOf(h2), s"trial=$trial w=$w held differ")
      assert(idsOf(r1).intersect(idsOf(h1)).isEmpty)
      assert(idsOf(r1) ++ idsOf(h1) === ids.toSet)
    }
  }
}
