package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record ingestion — the wire format a
  * crawl corpus actually arrives in, upstream of
  * [[graft.pipeline.Html]] / [[graft.pipeline.Web]]. Text-mode WARC
  * only (the WET/uncompressed-response shape); gzip members arrive
  * pre-inflated by the storage layer.
  *
  * Splitting rides the text source's multi-byte `lineSep`: the reader
  * hands each `WARC/1.0` -delimited segment to one row, so record
  * assembly is distributed and splittable — no driver-side scanning,
  * no whole-file reads, and a 100 TB crawl shards like any text data.
  * Header fields then parse with anchored per-field regexes and the
  * payload is everything after the first blank line — all codegen
  * projections.
  *
  * Malformed segments (no parseable header block) land in a quarantine
  * relation with the raw segment, the [[CsvCorpus]]/[[JsonlCorpus]]
  * audit-trail contract — gate on the rate, never crash the shard.
  *
  * Known tradeoff: splitting on the version marker instead of walking
  * Content-Length means a PAYLOAD containing the bare marker splits
  * its record — the tail lands in quarantine (no header block) and the
  * head keeps a truncated payload. Exact Content-Length walking is
  * inherently sequential (each length points at the next record) and
  * would serialize the scan; crawl WET payloads escape or never carry
  * the marker, which is why the splittable form is the standard trade.
  * Gate on the quarantine rate to surface the exception loudly. */
object WarcCorpus {

  /** The WARC version marker records begin with. */
  val recordMarker = "WARC/1.0"

  private def header(seg: Column, name: String): Column =
    regexp_extract(seg, s"(?m)^$name:[ \\t]*([^\\r\\n]*)$$", 1)

  /** Payload: everything after the first blank line, trailing
    * whitespace (the inter-record blank lines) stripped. */
  private def payloadOf(seg: Column): Column =
    regexp_replace(
      regexp_extract(seg, "(?s)\\r?\\n\\r?\\n(.*)", 1), "\\s+$", "")

  /** Read WARC shards under `path`. Returns (records, quarantine):
    * records = (warc_type, target_uri, record_id, payload); quarantine
    * = raw segments missing a WARC-Type header. The pre-marker file
    * preamble (empty under well-formed WARC) is dropped. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val segs = spark.read.option("lineSep", recordMarker).text(path)
      .where(regexp_replace(col("value"), "\\s", "") =!= "")
    val parsed = segs.select(
      header(col("value"), "WARC-Type").as("warc_type"),
      header(col("value"), "WARC-Target-URI").as("target_uri"),
      header(col("value"), "WARC-Record-ID").as("record_id"),
      payloadOf(col("value")).as("payload"),
      col("value"))
    val bad = col("warc_type") === ""
    (parsed.where(!bad).drop("value"),
      parsed.where(bad).select(col("value").as("raw_segment")))
  }

  /** Render (one WARC record per input row) — the writer side of the
    * round-trip and the synthesis the gate inverts. Content-Length is
    * the payload's character count (byte count for ASCII payloads). */
  def render(uri: Column, recordId: Column, payload: Column,
             warcType: String = "response"): Column =
    concat(
      lit(s"$recordMarker\nWARC-Type: $warcType\nWARC-Target-URI: "), uri,
      lit("\nWARC-Record-ID: "), recordId,
      lit("\nContent-Length: "), length(payload),
      lit("\n\n"), payload, lit("\n"))
}
