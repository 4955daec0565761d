package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV corpus ingestion with the same contracts as [[JsonlCorpus]] —
  * the second wire format metadata/label tables arrive in:
  *
  *  - EXPLICIT schema, never inference (a schema-less csv read scans
  *    the data once just to guess types, then drifts);
  *  - PERMISSIVE corrupt handling with an audit trail: malformed lines
  *    land in a quarantine relation (gate on the corrupt RATE via
  *    [[graft.operators.Expectations]]) instead of crashing the shard
  *    or silently dropping rows;
  *  - the text+from_csv formulation keeps both branches prune-safe
  *    single scans (the csv source refuses a corrupt-record-only
  *    projection, same as json — see the JsonlCorpus note).
  *
  * A `header`-ful file is handled by dropping lines equal to the
  * expected header string — exact, stateless, and correct per shard
  * (every shard repeats the header). EDGE: a data row whose raw text
  * exactly equals the header string is dropped too — unavoidable with
  * stateless per-shard filtering; if that collision is possible in your
  * domain, read with `header = None` and drop the header rows by
  * another key. */
object CsvCorpus {

  /** Read a CSV path against an explicit schema. Returns
    * (clean rows, quarantine — the raw malformed lines).
    *
    * Two quarantine triggers (spec-pinned): `from_csv` itself flags
    * token-conversion failures AND token-count-short lines as corrupt
    * (unlike Spark's file-based csv reader, which null-pads short
    * lines); and a row where any NON-NULLABLE schema field parsed to
    * null (e.g. an explicitly empty token — ",gamma" under a required
    * id — which converts to null without a parse error) is also routed
    * to quarantine. Declare the fields that must be present as
    * `nullable = false`; fields left nullable accept absent values by
    * design. */
  def read(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = ",", header: Option[String] = None)
      : (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val lines0 = spark.read.text(path)
    val lines = header.fold(lines0)(h => lines0.where(col("value") =!= h))
    val parsed = lines
      .select(col("value"), from_csv(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "sep" -> delimiter,
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
    val requiredNull = schema.fields.filterNot(_.nullable)
      .map(f => col(s"r.${f.name}").isNull)
      .foldLeft(lit(false))(_ || _)
    val bad = col("r._corrupt_record").isNotNull || requiredNull
    val clean = parsed.where(!bad)
      .select(schema.fieldNames.toSeq.map(f => col(s"r.$f")): _*)
    val quarantine = parsed.where(bad)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
  }
}
