package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** WARC segmentation + header/payload parsing contracts. */
class WarcCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("read: records split on the marker, headers parse, multi-line " +
      "payloads survive verbatim, headerless segments quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    java.nio.file.Files.writeString(dir.resolve("a.warc"),
      "WARC/1.0\nWARC-Type: response\n" +
        "WARC-Target-URI: https://ex.com/1\nWARC-Record-ID: r1\n" +
        "Content-Length: 11\n\npayload one\n\n" +
      "WARC/1.0\nWARC-Type: response\n" +
        "WARC-Target-URI: https://ex.com/2\nWARC-Record-ID: r2\n" +
        "Content-Length: 17\n\nline a\nline b\nend\n\n" +
      "WARC/1.0\ngarbage segment without headers\n\n" +
      "WARC/1.0\nWARC-Type: warcinfo\nWARC-Record-ID: r0\n\nmeta\n")
    val (recs, quarantine) = WarcCorpus.read(spark, dir.toString)
    val got = recs.orderBy("record_id")
      .as[(String, String, String, String)].collect().toSeq
    assert(got === Seq(
      ("warcinfo", "", "r0", "meta"),
      ("response", "https://ex.com/1", "r1", "payload one"),
      ("response", "https://ex.com/2", "r2", "line a\nline b\nend")))
    assert(quarantine.count() === 1L)
    assert(quarantine.head().getString(0).contains("garbage"))
  }

  test("render -> write -> read round-trips payloads and URIs exactly") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "first line\nsecond line"),
      (3L, "x")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_rt")
    docs.select(WarcCorpus.render(
        concat(lit("https://ex.com/doc-"), col("doc_id")),
        concat(lit("rec-"), col("doc_id")), col("text")).as("value"))
      .write.mode("overwrite").text(s"$dir/out")
    val (recs, quarantine) = WarcCorpus.read(spark, s"$dir/out")
    assert(quarantine.count() === 0L)
    val back = recs
      .select(regexp_extract(col("target_uri"), "doc-([0-9]+)", 1)
        .cast("long").as("doc_id"), col("payload"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(back === Seq((1L, "alpha beta gamma"),
      (2L, "first line\nsecond line"), (3L, "x")))
  }
}
