package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.{TextAnalysis, Web}

/** The streaming corpus-stats states are additively-merged relations;
  * reports read from them after any trigger equal the batch operators
  * over everything streamed so far — including grams and (dst, anchor,
  * src) hosts deliberately SPLIT across triggers, the case a naive
  * per-trigger rollup would double-count. */
class StreamingCorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch-merged diversity state reproduces batch " +
      "ngramDiversity after every trigger") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    var state: Option[DataFrame] = None
    val q = stream.toDS().toDF("doc_id", "source", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val h = StreamingCorpusStats.diversityState(batch, "source", "text", 2)
        state.synchronized {
          state = Some(state.fold(h)(s =>
            StreamingCorpusStats.mergeDiversity(s, h)).localCheckpoint())
        }
        ()
      }
      .start()
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    def assertParity(): Unit = {
      val fromState = rows(
        StreamingCorpusStats.diversityReport(state.get, "source"))
      val batch = rows(TextAnalysis.ngramDiversity(
        seen.toSeq.toDF("doc_id", "source", "text"), "source", "text", 2))
      assert(fromState === batch)
    }
    try {
      // trigger 1: bigram "alpha beta" appears twice in source s1
      val first = Seq(
        (1L, "s1", "alpha beta gamma alpha beta"),
        (2L, "s2", "delta epsilon zeta"))
      stream.addData(first: _*)
      seen ++= first
      q.processAllAvailable()
      assertParity()
      // trigger 2: the SAME bigram arrives again in s1 from a new doc —
      // the additive state must raise its count (and collision pairs)
      // across the trigger boundary
      val second = Seq(
        (3L, "s1", "alpha beta eta"),
        (4L, "s2", "delta epsilon theta"))
      stream.addData(second: _*)
      seen ++= second
      q.processAllAvailable()
      assertParity()
      // the cross-trigger gram genuinely accumulated: "alpha beta" in
      // s1 now counts 3 ⇒ collision_pairs ≥ 3 for s1
      val s1 = StreamingCorpusStats.diversityReport(state.get, "source")
        .where($"source" === "s1").head()
      assert(s1.getLong(4) >= 3L, s"collision pairs: ${s1.getLong(4)}")
    } finally q.stop()
  }

  test("foreachBatch-merged anchor state keeps the distinct-host count " +
      "exact when one host links across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var state: Option[DataFrame] = None
    val q = stream.toDS().toDF("url", "html")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val h = StreamingCorpusStats.anchorState(batch, "url", "html")
        state.synchronized {
          state = Some(state.fold(h)(s =>
            StreamingCorpusStats.mergeAnchor(s, h)).localCheckpoint())
        }
        ()
      }
      .start()
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    def assertParity(): Unit = {
      val fromState = rows(StreamingCorpusStats.anchorReport(state.get))
      val batch = rows(Web.anchorTexts(
        seen.toSeq.toDF("url", "html"), "url", "html"))
      assert(fromState === batch)
    }
    def page(host: String, path: String, anchors: (String, String)*) =
      (s"http://$host/$path",
        "<html><body>" + anchors.map { case (href, text) =>
          s"""<a href="$href">$text</a>""" }.mkString + "</body></html>")
    try {
      // trigger 1: hosts a.com and b.com both link (ref.org, "B")
      val first = Seq(
        page("a.com", "p1", ("http://ref.org/x", "B")),
        page("b.com", "p1", ("http://ref.org/y", "B")))
      stream.addData(first: _*)
      seen ++= first
      q.processAllAvailable()
      assertParity()
      // trigger 2: a.com links (ref.org, "B") AGAIN from another page —
      // n_links must rise to 3 while n_hosts stays 2 (a per-(dst,
      // anchor) rollup would have double-counted a.com here)
      val second = Seq(page("a.com", "p2", ("http://ref.org/z", "B")))
      stream.addData(second: _*)
      seen ++= second
      q.processAllAvailable()
      assertParity()
      val rep = StreamingCorpusStats.anchorReport(state.get)
        .where($"dst" === "ref.org" && $"anchor" === "B").head()
      assert((rep.getLong(2), rep.getLong(3)) === ((2L, 3L)))
    } finally q.stop()
  }
}
