package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw binary-blob ingestion via Spark's built-in `binaryFile` source —
  * the shape an image/audio corpus actually arrives in (one file per
  * asset) before it is repacked into parquet media tables
  * ([[graft.pipeline.Multimodal]]'s (media_id, payload, meta) form).
  *
  * Contracts:
  *  - `glob` is pushed down as `pathGlobFilter`, so sidecar junk
  *    (.tmp, .json manifests, thumbnails) never leaves the listing —
  *    scan-level filtering, not a post-filter;
  *  - ids parse from the FILENAME (the only metadata a blob dump has);
  *    files whose names don't match the id pattern surface in a
  *    quarantine relation instead of silently reading as NULL ids;
  *  - `maxBytes` guards the executor: `binaryFile` materializes each
  *    file as ONE row, so a stray multi-GB asset would OOM a task —
  *    oversized files are listed (path + length) and EXCLUDED from
  *    the payload relation. The length check uses the file-status
  *    column, not the content, so the guard costs nothing.
  */
object MediaFiles {

  /** Read a blob directory. Returns (media rows with ids parsed from
    * `<id>.<ext>` filenames: media_id, byte_len, payload; quarantine —
    * unparseable names or files over `maxBytes`, with the reason). */
  def read(spark: SparkSession, path: String, glob: String,
           maxBytes: Long): (DataFrame, DataFrame) = {
    require(maxBytes >= 1, s"maxBytes must be >= 1, got $maxBytes")
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)
      .select(col("path"), col("length"), col("content"))
    val id = regexp_extract(col("path"), "([0-9]+)\\.[A-Za-z0-9]+$", 1)
    val parsed = raw.withColumn("__id",
      when(id === "", lit(null)).otherwise(id.cast("long")))
    val bad = col("__id").isNull || col("length") > maxBytes
    val clean = parsed.where(!bad)
      .select(col("__id").as("media_id"), col("length").as("byte_len"),
        col("content").as("payload"))
    val quarantine = parsed.where(bad)
      .select(col("path"), col("length"),
        when(col("__id").isNull, lit("unparseable_name"))
          .otherwise(lit("oversized")).as("reason"))
    (clean, quarantine)
  }
}
