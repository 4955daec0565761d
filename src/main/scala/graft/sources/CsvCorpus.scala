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
  * (every shard repeats the header). */
object CsvCorpus {

  /** Read a CSV path against an explicit schema. Returns
    * (clean rows, quarantine — the raw malformed lines). */
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
    val clean = parsed.where(col("r._corrupt_record").isNull)
      .select(schema.fieldNames.toSeq.map(f => col(s"r.$f")): _*)
    val quarantine = parsed.where(col("r._corrupt_record").isNotNull)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
  }
}
