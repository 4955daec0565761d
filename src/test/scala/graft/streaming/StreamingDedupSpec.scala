package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Dedup

/** The streaming incremental-dedup path must emit exactly the batch
  * bipartite relation (Dedup.minHashLshPairsBipartite semantics) — in
  * batch mode AND per micro-batch over a MemoryStream. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus: a near-dup family, one exact dup of an incoming doc,
  // unrelated noise
  private val corpusRows = Seq(
    (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (102L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (103L, "the quick brown fox jumps over the lazy dog"),
    (104L, "completely different words here nothing shared at all"))
  // incoming batch: an exact dup of 103, a near-dup of 101/102, a clean doc
  private val newRows = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
    (3L, "fresh content with no twin anywhere in the corpus stores"))

  private lazy val corpus = corpusRows.toDF("doc_id", "text")
  private lazy val bands = StreamingDedup.corpusBands(corpus).cache()
  private lazy val sets = StreamingDedup.corpusSets(corpus).cache()

  private def batchExpected(t: Int): Set[(Long, Long, Long, Long)] =
    Dedup.minHashLshPairsBipartite(newRows.toDF("doc_id", "text"), corpus, t)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("batch mode: dedupPairs equals the bipartite batch operator") {
    for (t <- Seq(80, 90, 100)) {
      val got = StreamingDedup.dedupPairs(
          newRows.toDF("doc_id", "text"), bands, sets, t)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === batchExpected(t), s"threshold $t")
    }
    assert(batchExpected(80).map(p => (p._1, p._2)) ===
      Set((1L, 103L), (2L, 101L), (2L, 102L)))
  }

  test("streaming boilerplate strip: foreachBatch against the static " +
      "line-count state equals the batch operator") {
    import org.apache.spark.sql.functions.col
    // yesterday's corpus fixes the boilerplate state; new docs arrive
    // as a stream and strip against it per trigger (the groupBy inside
    // the strip makes direct append-mode streaming ill-typed — the
    // foreachBatch gate is the documented seam, as with ingest)
    val corpus = Seq(
      (101L, "shared header\nold body a"),
      (102L, "shared header\nold body b"),
      (103L, "shared header\nold body c")).toDF("doc_id", "text")
    val boiler = Dedup.lineDocCounts(corpus, "\n")
      .where(col("line_docs") >= 3).cache()
    val incoming = Seq(
      (1L, "shared header\nnew body one"),
      (2L, "new body two\nshared header")).toDF("doc_id", "text")
    val want = Dedup.removeBoilerplateWith(incoming, boiler, "\n")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      .toSet
    assert(want === Set((1L, 1L, "new body one"), (2L, 1L, "new body two")))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val sink = scala.collection.mutable.Set.empty[(Long, Long, String)]
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.synchronized {
          sink ++= Dedup.removeBoilerplateWith(batch, boiler, "\n")
            .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
        }
        ()
      }
      .start()
    try {
      stream.addData((1L, "shared header\nnew body one"))
      q.processAllAvailable()
      assert(sink.synchronized(sink.toSet) ===
        Set((1L, 1L, "new body one")))
      stream.addData((2L, "new body two\nshared header"))
      q.processAllAvailable()
      assert(sink.synchronized(sink.toSet) === want)
    } finally q.stop()
  }

  test("streaming mode: per-micro-batch output equals batch, " +
      "each pair lands in its doc's trigger") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingDedup.dedupPairs(
        stream.toDF().toDF("doc_id", "text"), bands, sets, 80)
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      stream.addData(newRows(0))
      q.processAllAvailable()
      val afterFirst = spark.table("stream_dedup")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterFirst === Set((1L, 103L))) // the exact dup, immediately
      stream.addData(newRows(1), newRows(2))
      q.processAllAvailable()
      val all = spark.table("stream_dedup")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(all === batchExpected(80))
    } finally q.stop()
  }
}
