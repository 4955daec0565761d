package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Dedup

/** The streaming winnowed-overlap path must emit exactly the batch
  * bipartite relation (Dedup.winnowedPairsBipartite semantics) — via
  * the prepared corpus relations in batch mode AND per micro-batch
  * over a MemoryStream. */
class StreamingWinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 4
  private val w = 5
  private val L = n + w - 1

  private def randTokens(seed: Int, count: Int): Seq[String] =
    (0 until count).map(i => s"t${seed}x$i")

  private val shared = randTokens(11, L).mkString(" ")
  private val other = randTokens(12, L + 2).mkString(" ")

  // corpus: two docs carry `shared`, one carries `other`, one clean
  private val corpusRows = Seq(
    (101L, (randTokens(21, 15) :+ shared).mkString(" ")),
    (102L, shared + " " + randTokens(22, 12).mkString(" ")),
    (103L, randTokens(23, 10).mkString(" ") + " " + other),
    (104L, randTokens(24, 30).mkString(" ")))
  // incoming: one hits both shared-carriers, one hits `other`, one clean
  private val newRows = Seq(
    (1L, randTokens(31, 8).mkString(" ") + " " + shared),
    (2L, other + " " + randTokens(32, 9).mkString(" ")),
    (3L, randTokens(33, 25).mkString(" ")))

  private lazy val corpus = corpusRows.toDF("doc_id", "text")
  private lazy val fps =
    Dedup.winnowedCorpusFingerprints(corpus, n, w).cache()
  private lazy val wins = Dedup.winnowedCorpusWindows(corpus, n, w).cache()

  private def batchExpected: Set[(Long, Long, Long)] =
    Dedup.winnowedPairsBipartite(newRows.toDF("doc_id", "text"), corpus,
        n, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("batch mode: winnowedPairsAgainst over prepared corpus " +
      "relations equals the bipartite batch operator") {
    val got = Dedup.winnowedPairsAgainst(newRows.toDF("doc_id", "text"),
        fps, wins, n, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batchExpected)
    assert(batchExpected.map(p => (p._1, p._2)) ===
      Set((1L, 101L), (1L, 102L), (2L, 103L)))
  }

  test("streaming mode: per-trigger foreachBatch output equals batch, " +
      "each document's overlaps land in its trigger") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val sink = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_stream").toString
    val q = StreamingWinnow.overlapStream(
      stream.toDF().toDF("doc_id", "text"), fps, wins, n, w,
      checkpointDir = dir) { (pairs, _) =>
      sink.synchronized {
        sink ++= pairs.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      ()
    }
    try {
      stream.addData(newRows(0))
      q.processAllAvailable()
      assert(sink.synchronized(sink.toSet).map(p => (p._1, p._2)) ===
        Set((1L, 101L), (1L, 102L))) // both corpus carriers, own trigger
      stream.addData(newRows(1), newRows(2))
      q.processAllAvailable()
      assert(sink.synchronized(sink.toSet) === batchExpected)
    } finally q.stop()
  }
}
