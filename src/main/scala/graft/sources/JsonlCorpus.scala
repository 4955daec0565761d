package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingestion — the wire format LLM text corpora actually
  * arrive in (one JSON document per line, typically gzipped shards).
  * Spark's json source does the heavy lifting; this seam pins the
  * contracts that matter at 100 TB:
  *
  *  - EXPLICIT schema, never inference: `spark.read.json` without a
  *    schema runs a full inference scan first (2× the IO) and drifts
  *    with the data; here the caller's schema is law.
  *  - PERMISSIVE corrupt handling with an audit trail: malformed lines
  *    land in `_corrupt_record` instead of killing the shard; [[read]]
  *    splits them into a quarantine relation so the pipeline can gate
  *    on the corrupt RATE (compose with
  *    [[graft.operators.Expectations]]) rather than choose between
  *    crash and silent drop.
  *  - gzip shards are NOT splittable — one task per .gz file. Fine for
  *    many ~100 MB shards (the usual corpus layout); repack via
  *    [[toParquet]] before heavy multi-pass work, which also buys
  *    column pruning and predicate pushdown JSON can never give.
  */
object JsonlCorpus {

  /** Read a JSONL path against an explicit schema. Returns
    * (clean rows, quarantine — the raw malformed lines).
    *
    * Implemented as a `text` scan + `from_json` rather than the json
    * source: Spark REFUSES a query whose only referenced column from a
    * raw json scan is `_corrupt_record` (the quarantine projection is
    * exactly that), and its documented workaround — cache the parsed
    * relation — is a non-starter at corpus scale. text+from_json keeps
    * both branches prune-safe single scans. */
  def read(spark: SparkSession, path: String,
           schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val parsed = spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
    val clean = parsed.where(col("r._corrupt_record").isNull)
      .select(schema.fieldNames.toSeq.map(f => col(s"r.$f")): _*)
    val quarantine = parsed.where(col("r._corrupt_record").isNotNull)
      .select(col("r._corrupt_record").as("raw_line"))
    (clean, quarantine)
  }

  /** One-pass repack to parquet: the standing advice for any corpus
    * that will be read more than once (splittable, column-pruned,
    * min/max-indexed). Returns the reloaded relation. */
  def toParquet(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
