package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Dedup

/** The streaming record-linkage path must emit exactly the batch
  * bipartite relation (Dedup.editDistancePairsBipartite semantics) — in
  * batch mode AND per micro-batch over a MemoryStream, against the
  * persisted master gram relations. */
class StreamingLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // master: two one-edit twins of incoming names, noise far away
  private val masterRows = Seq(
    (101L, "jonathan smithers"),
    (102L, "johnathan smithers"),
    (103L, "maria von trappe"),
    (104L, "completely unrelated"))
  // incoming: a 1-edit variant of 101/102, a 1-edit variant of 103,
  // a clean name
  private val newRows = Seq(
    (1L, "jonathan smitters"),
    (2L, "maria van trappe"),
    (3L, "zeta epsilon omicron"))

  private lazy val master = masterRows.toDF("id", "name")
  private lazy val grams =
    StreamingLinkage.masterGrams(master, "id", "name", maxDist = 1).cache()
  private lazy val freq = StreamingLinkage.masterGramFreq(grams).cache()
  private lazy val strings =
    StreamingLinkage.masterStrings(master, "id", "name").cache()

  private def batchExpected: Set[(Long, Long, Long)] =
    Dedup.editDistancePairsBipartite(newRows.toDF("id", "name"), master,
        "id", "name", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("batch mode: linkPairs over prepared relations equals the " +
      "bipartite batch operator") {
    val got = StreamingLinkage.linkPairs(newRows.toDF("id", "name"),
        "id", "name", grams, freq, strings, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batchExpected)
    assert(batchExpected.map(p => (p._1, p._2)) ===
      Set((1L, 101L), (2L, 103L)))
  }

  test("streaming mode: per-trigger foreachBatch output equals batch, " +
      "each record's links land in its trigger") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val sink = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val dir = java.nio.file.Files
      .createTempDirectory("graft_link_stream").toString
    val q = StreamingLinkage.linkStream(
      stream.toDF().toDF("id", "name"), "id", "name",
      grams, freq, strings, maxDist = 1, q = 3, checkpointDir = dir) {
      (pairs, _) =>
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
        Set((1L, 101L))) // the 1-edit twin, in its own trigger
      stream.addData(newRows(1), newRows(2))
      q.processAllAvailable()
      assert(sink.synchronized(sink.toSet) === batchExpected)
    } finally q.stop()
  }
}
